"""String scalar functions (§2.11) — Column expressions only."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_trailing_dot(c: Column) -> Column:
    """Trim a single trailing '.' from a domain name.

    Reference: strings.TrimRight(name, ".") in the packetbeat and
    gamelinux parsers (format/format_packetbeat.go:56-57,
    format/format_gamelinux.go:55-56). TrimRight removes ALL trailing
    dots, so we match with a greedy anchor.
    """
    return F.regexp_replace(c, r"\.+$", "")


def normalize_ts_fraction(ts: Column, digits: int = 6) -> Column:
    """Normalize an optional fractional-seconds field to exactly
    ``digits`` digits so Spark's strict S-count patterns parse it.

    Go's time.Parse accepts a fractional second of ANY length after
    the seconds field (and none at all) — layouts like
    ``2006-01-02T15:04:05.999999-0700`` (format_suricata.go:52) parse
    '…:09Z', '…:09.5Z' and '…:09.534255Z' alike. Spark's ``SSSSSS``
    demands exactly six digits, which round 1 shipped — silently
    dropping valid records with shorter fractions. This inserts a
    missing fraction, truncates beyond ``digits``, and zero-pads to
    ``digits`` with a chain of codegen-friendly regexp_replace calls.
    """
    # insert ".0" when the seconds field has no fraction
    out = F.regexp_replace(ts, r"(\d{2}:\d{2}:\d{2})(?!\.)", r"$1.0")
    # truncate an over-long fraction
    out = F.regexp_replace(out, r"(\.\d{%d})\d+" % digits, r"$1")
    # zero-pad shorter fractions up to `digits`
    for k in range(1, digits):
        out = F.regexp_replace(
            out, r"\.(\d{%d})(?=[^0-9]|$)" % k, "." + "$1" + "0" * (digits - k)
        )
    return out


def dns_wire_to_name(raw: Column) -> Column:
    """DNS wire-format label sequence -> dotted name
    (format/format_nmsg.go:11-27).

    Input: BinaryType column of length-prefixed labels, e.g.
    b"\\x03www\\x07example\\x03com\\x00" -> "www.example.com".

    Implemented as a recursive SQL expression over the byte array using
    aggregate() on a position sequence — stays JVM-side. Labels are
    bounded at 63 bytes and names at 255, so a bounded unroll via
    aggregate over up to 127 label positions is safe.
    """
    # Walk positions: state = struct(pos, acc). At each step, read the
    # length byte at pos; if 0 or past end, stop (keep state); else
    # append the label and jump pos+len+1.
    # F.aggregate over a fixed 127-element sequence (max labels in a
    # 255-byte name).
    def step(state, _):
        pos = state.getField("pos")
        acc = state.getField("acc")
        ln = F.conv(F.hex(F.substring(raw, pos, 1)), 16, 10).cast("int")
        done = pos.isNull() | (pos > F.length(raw)) | ln.isNull() | (ln == 0) | (ln > 63)
        # decode label bytes as latin-1 (byte-preserving); cast("string")
        # would be a UTF-8 decode that garbles non-ASCII labels
        label = F.decode(F.substring(raw, pos + 1, ln), "ISO-8859-1")
        new_acc = F.when(acc == "", label).otherwise(F.concat_ws(".", acc, label))
        return F.when(done, state).otherwise(
            F.struct((pos + ln + 1).alias("pos"), new_acc.alias("acc"))
        )

    init = F.struct(F.lit(1).alias("pos"), F.lit("").alias("acc"))
    seq = F.sequence(F.lit(1), F.lit(127))
    return F.aggregate(seq, init, step).getField("acc")


def domain_suffixes(name: Column, min_labels: int = 2) -> Column:
    """Every parent-domain suffix of ``name`` with at least
    ``min_labels`` labels, longest first (the name itself included):
    'a.b.evil.example' -> ['a.b.evil.example', 'b.evil.example',
    'evil.example']. Pure codegen array algebra — the expansion that
    turns wildcard suffix matching into an equi-join
    (operators/query.blocklist_match). Names with fewer than
    min_labels labels yield just themselves."""
    labels = F.split(name, r"\.")
    n = F.size(labels)
    return F.when(n <= min_labels, F.array(name)).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - min_labels + 1),
            lambda i: F.concat_ws(
                ".", F.slice(labels, i, n)  # slice clamps at the end
            ),
        )
    )
