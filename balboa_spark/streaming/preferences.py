"""Custom stateful streaming operator: incremental preference-pair
assembly.

The batch twin is ``sft.preference_pairs`` (driver-graded,
`sft_pairs`): per prompt, the best-scored response pairs against the
worst. In production the rating events ARRIVE as a stream (human
feedback, reward-model sweeps), and the pair for a prompt changes as
new responses land — this module maintains it incrementally with
``applyInPandasWithState``:

- state per prompt = the current best and worst (score, id, text)
  triples — TWO payload structs regardless of how many responses the
  prompt has seen (the max_by/min_by boundedness contract carried
  into streaming state);
- selection is the batch tie rule exactly: best = highest score,
  ties to the LOWEST id; worst = lowest score, ties to the LOWEST
  id. Both folds are associative and commutative, so cross-batch
  arrival order cannot change the result — after any prefix of the
  stream, the LATEST emitted row per prompt equals
  ``preference_pairs`` over the union of events so far (pinned by
  the equivalence test);
- a row is EMITTED for a prompt only when its pair changed in the
  batch AND a strict preference exists (best score > worst score) —
  the batch operator's equal-best-and-worst drop;
- NULL/NaN scores and NULL ids are excluded by contract, as in
  batch. No timeout: a prompt's pair stays live for as long as the
  query runs (state is prompt-count-bounded, not event-bounded).

Rendering matches the batch chat template byte for byte:
``<|system|>s<|end|>`` preamble + ``<|user|>prompt<|end|>`` +
``<|assistant|>text<|end|>`` (the sft module's _piece form) — the
equivalence test compares rendered strings, not just ids.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PAIR_SCHEMA = StructType(
    [
        StructField("prompt_id", LongType(), False),
        StructField("chosen_id", LongType(), False),
        StructField("rejected_id", LongType(), False),
        StructField("chosen_score", DoubleType(), False),
        StructField("rejected_score", DoubleType(), False),
        StructField("chosen", StringType(), False),
        StructField("rejected", StringType(), False),
    ]
)

#: state: current best and worst (score, id, text)
STATE_SCHEMA = StructType(
    [
        StructField("b_score", DoubleType()),
        StructField("b_id", LongType()),
        StructField("b_text", StringType()),
        StructField("w_score", DoubleType()),
        StructField("w_id", LongType()),
        StructField("w_text", StringType()),
    ]
)


def _render(system_prompt: str | None, prompt_id, text: str) -> str:
    body = f"<|user|>{prompt_id}<|end|><|assistant|>{text}<|end|>"
    if system_prompt is not None:
        return f"<|system|>{system_prompt}<|end|>" + body
    return body


def _pair_fn(system_prompt: str | None):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (prompt_id,) = key
        if state.exists:
            b_score, b_id, b_text, w_score, w_id, w_text = state.get
        else:
            b_score = b_id = b_text = w_score = w_id = w_text = None
        changed = False
        for pdf in pdfs:
            for s, i, t in zip(
                pdf["score"], pdf["response_id"], pdf["response"]
            ):
                # NULL score OR NULL id is excluded by contract, as in
                # the batch twin.  Arrow->pandas converts a nullable
                # long column to float64, so a NULL id arrives as NaN
                # (a float), not None — pd.isna catches both shapes.
                if pd.isna(s) or pd.isna(i):
                    continue
                # string ids pass through (binary-UTF-8 tie order, as
                # in batch); integral ids normalize to Python int so
                # numpy scalars from Arrow compare cleanly with state
                s = float(s)
                i = i if isinstance(i, str) else int(i)
                t = "" if t is None else str(t)
                # best: highest score, ties -> lowest id
                if b_score is None or s > b_score or (
                    s == b_score and i < b_id
                ):
                    b_score, b_id, b_text, changed = s, i, t, True
                # worst: lowest score, ties -> lowest id
                if w_score is None or s < w_score or (
                    s == w_score and i < w_id
                ):
                    w_score, w_id, w_text, changed = s, i, t, True
        if b_score is not None:
            state.update((b_score, b_id, b_text, w_score, w_id, w_text))
        # emit only on change, and only under a STRICT preference —
        # the batch operator's equal-best-and-worst drop
        if changed and b_score is not None and b_score > w_score:
            yield pd.DataFrame(
                {
                    "prompt_id": [prompt_id],
                    "chosen_id": [b_id],
                    "rejected_id": [w_id],
                    "chosen_score": [b_score],
                    "rejected_score": [w_score],
                    "chosen": [_render(system_prompt, prompt_id, b_text)],
                    "rejected": [_render(system_prompt, prompt_id, w_text)],
                }
            )

    return fn


def preference_stream(
    ratings: DataFrame,
    system_prompt: str | None = None,
    prompt_col: str = "prompt_id",
) -> DataFrame:
    """Streaming DF (prompt_id, response_id, response, score) ->
    stream of UPDATED preference pairs (one row per prompt per batch
    in which its pair changed; the latest row per prompt is the
    current pair and equals the batch operator over all events so
    far). Use outputMode('update')/'append' with a sink that keeps
    latest-per-prompt.

    ``response_id`` (and ``prompt_col``) may be long OR string — the
    output/state schemas are derived from the input schema, matching
    the batch twin's r16 string-id support; string ties break on
    binary UTF-8 order exactly as in batch."""
    in_fields = {f.name: f.dataType for f in ratings.schema.fields}
    id_t = in_fields.get("response_id", LongType())
    prompt_t = in_fields.get(prompt_col, LongType())
    pair_schema = StructType(
        [
            StructField("prompt_id", prompt_t, False),
            StructField("chosen_id", id_t, False),
            StructField("rejected_id", id_t, False),
            StructField("chosen_score", DoubleType(), False),
            StructField("rejected_score", DoubleType(), False),
            StructField("chosen", StringType(), False),
            StructField("rejected", StringType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("b_score", DoubleType()),
            StructField("b_id", id_t),
            StructField("b_text", StringType()),
            StructField("w_score", DoubleType()),
            StructField("w_id", id_t),
            StructField("w_text", StringType()),
        ]
    )
    return ratings.groupBy(prompt_col).applyInPandasWithState(
        _pair_fn(system_prompt),
        outputStructType=pair_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
