"""SFT assembly (operators.sft): conversation threading, chat-template
rendering, loss-mask spans."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from balboa_spark.operators import sft


def _ts(minute, second=0, hour=0):
    return dt.datetime(2024, 1, 1, hour, minute, second)


def _events(spark):
    # user u: one conversation of 3 turns, then a >30min gap, then 1
    # turn; user v: single event. Exact-timestamp tie on (u, :05).
    rows = [
        (1, "u", _ts(0), "ask", '{"q": 1}'),
        (2, "u", _ts(5), "answer", '{"a": 1}'),
        (3, "u", _ts(5), "ask", None),          # tie with event 2; NULL props
        (4, "u", _ts(50), "ask", '{"q": 2}'),   # new conversation (gap 45m)
        (5, "v", _ts(7), "hello", '{"x": "ü"}'),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, event_type string, props string"
    )


def test_conversation_turns_threading_and_roles(spark):
    t = sft.conversation_turns(_events(spark)).orderBy(
        "user_id", "conv_id", "turn_idx"
    )
    rows = [(r.user_id, r.conv_id, r.turn_idx, r.role, r.content) for r in t.collect()]
    assert rows == [
        ("u", 1, 1, "user", 'ask {"q": 1}'),
        ("u", 1, 2, "assistant", 'answer {"a": 1}'),
        # ts tie broken by event_id: event 3 AFTER event 2
        ("u", 1, 3, "user", "ask "),  # NULL props -> coalesce('')
        ("u", 2, 1, "user", 'ask {"q": 2}'),
        ("v", 1, 1, "user", 'hello {"x": "ü"}'),
    ]


def test_render_matches_manual_template(spark):
    r = (
        sft.render_conversations(
            sft.conversation_turns(_events(spark)), system_prompt="sys"
        )
        .filter((F.col("user_id") == "u") & (F.col("conv_id") == 1))
        .first()
    )
    expected = (
        "<|system|>sys<|end|>"
        '<|user|>ask {"q": 1}<|end|>'
        '<|assistant|>answer {"a": 1}<|end|>'
        "<|user|>ask <|end|>"
    )
    assert r.rendered == expected
    assert r.n_turns == 3
    assert r.total_chars == len(expected)
    assert r.assistant_chars == len('answer {"a": 1}')
    assert r.assistant_turns == 1


def test_loss_spans_slice_the_rendered_content(spark):
    turns = sft.conversation_turns(_events(spark))
    rendered = {
        (r.user_id, r.conv_id): r.rendered
        for r in sft.render_conversations(turns, system_prompt="sys").collect()
    }
    spans = sft.loss_mask_spans(turns, system_prompt="sys")
    both = spans.join(
        turns.select("user_id", "conv_id", "turn_idx", "content"),
        ["user_id", "conv_id", "turn_idx"],
    ).collect()
    assert len(both) == 5
    n_loss = 0
    for r in both:
        text = rendered[(r.user_id, r.conv_id)]
        # the span slices exactly the turn's content out of the render
        assert text[r.content_start : r.content_end] == r.content
        assert r.loss_mask == (1 if r.role == "assistant" else 0)
        n_loss += r.loss_mask
    assert n_loss == 1


def test_cli_sft_render_e2e(spark, tmp_path):
    """sft-render CLI: events parquet in, transcripts + spans out."""
    from balboa_spark.cli import build_parser, run

    inp, out = str(tmp_path / "ev"), str(tmp_path / "out")
    _events(spark).write.parquet(inp)
    argv = ["sft-render", inp, out, "--system-prompt", "sys"]
    assert run(build_parser().parse_args(argv), spark=spark) == 0
    tr = spark.read.parquet(out + "/transcripts")
    sp = spark.read.parquet(out + "/spans")
    assert tr.count() == 3 and sp.count() == 5
    assert all(r.rendered.startswith("<|system|>sys<|end|>") for r in tr.collect())


def test_explicit_role_column_overrides_alternation(spark):
    df = _events(spark).withColumn(
        "who", F.when(F.col("event_id") % 2 == 0, "assistant").otherwise("tool")
    )
    t = sft.conversation_turns(df, role_col="who")
    roles = {r.turn_idx: r.role for r in t.filter(
        (F.col("user_id") == "u") & (F.col("conv_id") == 1)).collect()}
    assert roles == {1: "tool", 2: "assistant", 3: "tool"}


def _sft_py(events, gap_min, system_prompt):
    """Pure-Python reference: thread -> render -> spans."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for eid, uid, ts, content in events:
        if ts is None:
            continue
        by_user[uid].append((ts, eid, content))
    renders, spans = {}, []
    for uid, evs in by_user.items():
        evs.sort()
        convs, cur, last = [], [], None
        for ts, eid, content in evs:
            if cur and (ts - last).total_seconds() > gap_min * 60:
                convs.append(cur)
                cur = []
            cur.append(content)
            last = ts
        convs.append(cur)
        for ci, conv in enumerate(convs, start=1):
            parts = [f"<|system|>{system_prompt}<|end|>"] if system_prompt else []
            pos = sum(len(p) for p in parts)
            a_chars = 0
            for ti, content in enumerate(conv, start=1):
                role = "user" if ti % 2 == 1 else "assistant"
                tag = f"<|{role}|>"
                start = pos + len(tag)
                spans.append((uid, ci, ti, role, start, start + len(content),
                              1 if role == "assistant" else 0))
                if role == "assistant":
                    a_chars += len(content)
                parts.append(f"{tag}{content}<|end|>")
                pos = start + len(content) + len("<|end|>")
            r = "".join(parts)
            renders[(uid, ci)] = (len(conv), r, len(r), a_chars)
    return renders, sorted(spans)


def test_sft_assembly_matches_python_reference_fuzz(spark):
    """Property: for random event streams (duplicate timestamps,
    unicode contents, NULL ts, multi-user, gap edges), the distributed
    thread->render->spans pipeline equals a pure-Python reference."""
    import datetime as dt

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    content = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
        min_size=0, max_size=8,
    )
    event = st.tuples(
        st.integers(0, 2),                       # user
        st.one_of(st.none(), st.integers(0, 120)),  # minutes offset (None=NULL ts)
        content,
    )

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(evs=st.lists(event, min_size=1, max_size=14))
    def check(evs):
        rows = [
            (i, u, None if m is None else base + dt.timedelta(minutes=m), c)
            for i, (u, m, c) in enumerate(evs)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, content string"
        )
        from balboa_spark.operators import sft

        turns = sft.conversation_turns(
            df, content_col=F.col("content"), gap_minutes=30
        )
        got_r = {
            (r.user_id, r.conv_id): (r.n_turns, r.rendered, r.total_chars,
                                     r.assistant_chars)
            for r in sft.render_conversations(turns, system_prompt="s").collect()
        }
        got_s = sorted(
            (r.user_id, r.conv_id, r.turn_idx, r.role, r.content_start,
             r.content_end, r.loss_mask)
            for r in sft.loss_mask_spans(turns, system_prompt="s").collect()
        )
        # reference threads by (ts, event_id) — same tie-break
        exp_r, exp_s = _sft_py(rows, 30, "s")
        assert got_r == exp_r
        assert got_s == exp_s

    check()


def test_sft_conversations_through_attribute_store(spark, tmp_path):
    """Tag-once-mix-many generalizes beyond documents: rendered
    conversations tag into the AttributeStore (n_turns /
    assistant_share signals) and a mixer rule keeps only substantive
    conversations — text touched once by the final semi-join."""
    from balboa_spark.operators import sft
    from balboa_spark.operators.attributes import AttributeStore

    turns = sft.conversation_turns(_events(spark))
    convs = sft.render_conversations(turns, system_prompt="s").select(
        (F.abs(F.hash("user_id")).cast("long") * 100 + F.col("conv_id")).alias("doc_id"),
        "n_turns",
        "assistant_chars",
        "total_chars",
        "rendered",
    )
    store = AttributeStore(spark, str(tmp_path / "attrs"))
    store.write(
        convs.select(
            "doc_id",
            "n_turns",
            (F.col("assistant_chars") / F.col("total_chars")).alias("a_share"),
        ),
        tagger="conv",
    )
    kept = store.mix(
        convs.select("doc_id", "rendered"),
        ["conv"],
        "conv__n_turns >= 2 AND conv__a_share > 0.05",
    )
    got = kept.count()
    # only user u's first conversation has >= 2 turns with assistant mass
    assert got == 1


def test_preference_pairs_selection_ties_and_template(spark):
    """Chosen = highest score (ties -> lowest id), rejected = lowest
    score (ties -> lowest id); equal best/worst (incl. single-response
    prompts) drop; NULL/NaN scores and NULL ids are excluded; the
    rendered pair uses the chat template with the system preamble."""
    rows = [
        # prompt 1: clear winner/loser + a NaN and a NULL to ignore
        (1, 10, "a", 5.0), (1, 11, "b", 1.0), (1, 12, "c", 3.0),
        (1, 13, "nan", float("nan")), (1, 14, "nul", None),
        # prompt 2: tie at the top (9.0 twice -> lowest id 20 wins)
        # and tie at the bottom (2.0 twice -> lowest id 22)
        (2, 21, "t2", 9.0), (2, 20, "t1", 9.0),
        (2, 23, "b2", 2.0), (2, 22, "b1", 2.0),
        # prompt 3: all equal -> dropped
        (3, 30, "x", 4.0), (3, 31, "y", 4.0),
        # prompt 4: single response -> dropped
        (4, 40, "only", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "prompt_id long, response_id long, response string, score double"
    )
    got = {
        r.prompt_id: r
        for r in sft.preference_pairs(df, system_prompt="s").collect()
    }
    assert set(got) == {1, 2}
    assert (got[1].chosen_id, got[1].rejected_id) == (10, 11)
    assert (got[1].chosen_score, got[1].rejected_score) == (5.0, 1.0)
    assert got[1].chosen == "<|system|>s<|end|><|user|>1<|end|><|assistant|>a<|end|>"
    assert got[1].rejected == "<|system|>s<|end|><|user|>1<|end|><|assistant|>b<|end|>"
    assert (got[2].chosen_id, got[2].rejected_id) == (20, 22)


def test_preference_pairs_matches_python_reference_fuzz(spark):
    """Pure-Python parity fuzz (the sft_assembly fuzz bar): random
    scored responses across many prompts -> the groupBy max_by/min_by
    plan equals the obvious per-prompt Python argmax/argmin with the
    same tie rules."""
    import math
    import random

    random.seed(42)
    rows = []
    rid = 0
    for p in range(60):
        for _ in range(random.randint(1, 8)):
            score = random.choice(
                [None, float("nan")] + [float(random.randint(0, 4))] * 8
            )
            rows.append((p, rid, f"r{rid}", score))
            rid += 1
    df = spark.createDataFrame(
        rows, "prompt_id long, response_id long, response string, score double"
    )
    got = {
        r.prompt_id: (r.chosen_id, r.rejected_id)
        for r in sft.preference_pairs(df).collect()
    }
    by_prompt: dict[int, list] = {}
    for p, i, _t, s in rows:
        if s is None or (isinstance(s, float) and math.isnan(s)):
            continue
        by_prompt.setdefault(p, []).append((s, i))
    want = {}
    for p, rs in by_prompt.items():
        chosen = min(rs, key=lambda e: (-e[0], e[1]))
        rejected = min(rs, key=lambda e: (e[0], e[1]))
        if chosen[0] > rejected[0]:
            want[p] = (chosen[1], rejected[1])
    assert got == want and want


def test_rejection_sample_threshold_topk_and_template(spark):
    """Per prompt: responses below the threshold drop; the survivors
    rank (score desc, ties -> lowest id) and only the top-k render;
    NULL/NaN scores excluded; k >= 1 enforced; non-integral id
    refused."""
    import pytest

    rows = [
        (1, 10, "a", 9.0), (1, 11, "b", 9.0), (1, 12, "c", 7.0),
        (1, 13, "d", 2.0),              # below threshold
        (1, 14, "e", float("nan")), (1, 15, "f", None),
        (2, 20, "x", 1.0),              # all below -> prompt drops
    ]
    df = spark.createDataFrame(
        rows, "prompt_id long, response_id long, response string, score double"
    )
    got = sft.rejection_sample(df, threshold=5.0, k=2, system_prompt="s")
    out = sorted(
        (r.prompt_id, r.rank, r.response_id, r.score) for r in got.collect()
    )
    # tie at 9.0 -> id 10 ranks 1, id 11 ranks 2; c (7.0) cut by k=2
    assert out == [(1, 1, 10, 9.0), (1, 2, 11, 9.0)]
    r1 = {r.rank: r.rendered for r in got.collect()}
    assert r1[1] == "<|system|>s<|end|><|user|>1<|end|><|assistant|>a<|end|>"

    with pytest.raises(ValueError, match="k must be"):
        sft.rejection_sample(df, threshold=5.0, k=0)
    # float ids refused (NaN breaks the total order); strings are OK
    bad = df.withColumn("response_id", df.response_id.cast("double"))
    with pytest.raises(ValueError, match="integral or string"):
        sft.rejection_sample(bad, threshold=5.0)
    with pytest.raises(ValueError, match="integral or string"):
        sft.preference_pairs(bad)


def test_preference_family_string_ids(spark):
    """String (UUID-style) response ids work end-to-end (r15 verdict
    gap #2): ties break on binary UTF-8 order — the lexicographically
    LOWEST id — in both preference_pairs and rejection_sample, and the
    selected ids survive into the output columns unchanged."""
    rows = [
        # prompt 1: tie at the top (7.0) -> "aa-2" < "ab-1" wins;
        # tie at the bottom (1.0) -> "ba-9" < "bb-0"
        (1, "ab-1", "t2", 7.0), (1, "aa-2", "t1", 7.0),
        (1, "bb-0", "b2", 1.0), (1, "ba-9", "b1", 1.0),
        # prompt 2: NULL id excluded; remaining pair is strict
        (2, None, "ghost", 99.0), (2, "x1", "hi", 3.0), (2, "x2", "lo", 2.0),
    ]
    df = spark.createDataFrame(
        rows,
        "prompt_id long, response_id string, response string, score double",
    )
    got = {
        r.prompt_id: r for r in sft.preference_pairs(df).collect()
    }
    assert (got[1].chosen_id, got[1].rejected_id) == ("aa-2", "ba-9")
    assert (got[2].chosen_id, got[2].rejected_id) == ("x1", "x2")

    rej = sorted(
        (r.prompt_id, r.rank, r.response_id)
        for r in sft.rejection_sample(df, threshold=2.5, k=2).collect()
    )
    assert rej == [(1, 1, "aa-2"), (1, 2, "ab-1"), (2, 1, "x1")]


def test_rejection_sample_matches_python_reference_fuzz(spark):
    """Pure-Python parity fuzz: the slice(sort_array(collect_list))
    plan equals the obvious per-prompt sorted-filter with the same
    threshold and tie rules."""
    import math
    import random

    random.seed(77)
    rows, rid = [], 0
    for p in range(50):
        for _ in range(random.randint(1, 9)):
            s = random.choice(
                [None, float("nan")] + [float(random.randint(0, 6))] * 8
            )
            rows.append((p, rid, f"r{rid}", s))
            rid += 1
    df = spark.createDataFrame(
        rows, "prompt_id long, response_id long, response string, score double"
    )
    K, TH = 3, 3.0
    got = sorted(
        (r.prompt_id, r.rank, r.response_id)
        for r in sft.rejection_sample(df, threshold=TH, k=K).collect()
    )
    by_p: dict[int, list] = {}
    for p, i, _t, s in rows:
        if s is None or (isinstance(s, float) and math.isnan(s)) or s < TH:
            continue
        by_p.setdefault(p, []).append((-s, i))
    want = []
    for p, rs in by_p.items():
        for rk, (_negs, i) in enumerate(sorted(rs)[:K], start=1):
            want.append((p, rk, i))
    assert got == sorted(want) and want


def test_preference_pairs_topk_bounded_allpairs(spark):
    """K-way ranking -> bounded all-pairs: top-k chosen x bottom-k
    rejected per prompt, strict margin filter, deterministic ranks,
    rendered template; a response in both candidate sets never pairs
    with itself."""
    rows = [
        # prompt 1: scores 9,7,5,3,1 (ids 10..14) with k=2 ->
        # chosen candidates (10,11), rejected candidates (14,13);
        # all 4 cross pairs are strict
        (1, 10, "a", 9.0), (1, 11, "b", 7.0), (1, 12, "c", 5.0),
        (1, 13, "d", 3.0), (1, 14, "e", 1.0),
        # prompt 2: two equal scores -> no strict pair
        (2, 20, "x", 4.0), (2, 21, "y", 4.0),
        # prompt 3: single response -> in both sets, never self-pairs
        (3, 30, "solo", 8.0),
    ]
    df = spark.createDataFrame(
        rows, "prompt_id long, response_id long, response string, score double"
    )
    got = sft.preference_pairs_topk(df, k=2, system_prompt="s")
    out = sorted(
        (r.prompt_id, r.chosen_id, r.rejected_id,
         r.chosen_rank, r.rejected_rank)
        for r in got.collect()
    )
    assert out == [
        (1, 10, 13, 1, 2), (1, 10, 14, 1, 1),
        (1, 11, 13, 2, 2), (1, 11, 14, 2, 1),
    ]
    r1 = [r for r in got.collect() if r.chosen_id == 10 and r.rejected_id == 14][0]
    assert r1.chosen == "<|system|>s<|end|><|user|>1<|end|><|assistant|>a<|end|>"
    assert r1.rejected == "<|system|>s<|end|><|user|>1<|end|><|assistant|>e<|end|>"

    # margin: only pairs with gap > 4.0 survive
    wide = sorted(
        (r.chosen_id, r.rejected_id)
        for r in sft.preference_pairs_topk(df, k=2, min_margin=4.0).collect()
    )
    assert wide == [(10, 13), (10, 14), (11, 14)]


def test_preference_pairs_topk_matches_python_reference_fuzz(spark):
    """Parity fuzz: the salted two-stage candidate selection + local
    k x k cross equals the obvious per-prompt sorted top/bottom-k
    expansion (the rejection_sample fuzz bar), including string-id
    tie behavior."""
    import math
    import random

    random.seed(1234)
    rows, rid = [], 0
    for p in range(40):
        for _ in range(random.randint(1, 10)):
            s = random.choice(
                [None, float("nan")] + [float(random.randint(0, 5))] * 8
            )
            rows.append((p, f"r{rid}", f"t{rid}", s))
            rid += 1
    df = spark.createDataFrame(
        rows, "prompt_id long, response_id string, response string, score double"
    )
    K = 3
    got = sorted(
        (r.prompt_id, r.chosen_id, r.rejected_id,
         r.chosen_rank, r.rejected_rank)
        for r in sft.preference_pairs_topk(df, k=K).collect()
    )
    by_p: dict[int, list] = {}
    for p, i, _t, s in rows:
        if s is None or (isinstance(s, float) and math.isnan(s)):
            continue
        by_p.setdefault(p, []).append((s, i))
    want = []
    for p, rs in by_p.items():
        top = sorted(rs, key=lambda e: (-e[0], e[1]))[:K]
        bot = sorted(rs, key=lambda e: (e[0], e[1]))[:K]
        for ci, (cs, cid) in enumerate(top, 1):
            for ri, (rs_, rid_) in enumerate(bot, 1):
                if cs > rs_ and cid != rid_:
                    want.append((p, cid, rid_, ci, ri))
    assert got == sorted(want) and want
