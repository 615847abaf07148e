"""Unit semantics for the PII scrub and line-level boilerplate dedup
operators (crafted fixtures; the cross-engine contract sweep covers the
corpus-scale path)."""

from pyspark.sql import functions as F

from searchengine_spark.operators.dedup import line_dedup
from searchengine_spark.operators.pii import pii_scrub


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pii_scrub_counts_and_redaction(spark):
    rows = [
        (1, "mail a.b-c_d@sub.example.co.uk now"),
        (2, "call 555-123-4567 or 555 987 6543"),
        (3, "host 192.168.0.1 and 10.0.255.7"),
        (4, "clean text with no pii at all"),
        (5, "mixed bob@x.io at 1.2.3.4 tel 123-456-7890"),
    ]
    out = {r["doc_id"]: r for r in pii_scrub(_docs(spark, rows)).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["clean_text"] == "mail <EMAIL> now"
    assert out[2]["n_phones"] == 2
    assert out[2]["clean_text"] == "call <PHONE> or <PHONE>"
    assert out[3]["n_ipv4s"] == 2
    assert out[3]["clean_text"] == "host <IP> and <IP>"
    assert out[4]["n_emails"] == out[4]["n_ipv4s"] == out[4]["n_phones"] == 0
    assert out[4]["clean_text"] == rows[3][1]
    assert (out[5]["n_emails"], out[5]["n_ipv4s"], out[5]["n_phones"]) == (1, 1, 1)
    assert out[5]["clean_text"] == "mixed <EMAIL> at <IP> tel <PHONE>"


def test_pii_rule_order_email_wins_over_ip():
    # an IPv4-shaped email domain is consumed by the email pass first —
    # the ordering contract the module docstring promises
    from searchengine_spark.operators.pii import PII_RULES

    assert [n for n, _, _ in PII_RULES] == ["email", "ipv4", "phone"]


def test_pii_ip_only_domain_is_not_email(spark):
    out = pii_scrub(_docs(spark, [(1, "u@10.0.0.1 plus 10.0.0.2")])).collect()[0]
    # u@10.0.0.1: RE requires an alpha TLD, so it is NOT an email;
    # both dotted quads are IPs
    assert out["n_emails"] == 0
    assert out["n_ipv4s"] == 2


def test_line_dedup_drops_common_lines_keeps_order(spark):
    header = "shared header"
    rows = [(i, f"{header}\nunique body {i}\nshared footer") for i in range(12)]
    rows.append((99, "only unique content"))
    out = {
        r["doc_id"]: r
        for r in line_dedup(_docs(spark, rows), min_docs=10).collect()
    }
    for i in range(12):
        assert out[i]["n_lines"] == 3
        assert out[i]["n_dropped"] == 2
        assert out[i]["clean_text"] == f"unique body {i}"
    assert out[99]["n_dropped"] == 0
    assert out[99]["clean_text"] == "only unique content"


def test_line_dedup_all_boilerplate_doc_survives_empty(spark):
    rows = [(i, "banner") for i in range(10)]
    out = line_dedup(_docs(spark, rows), min_docs=10).collect()
    assert len(out) == 10
    assert all(r["clean_text"] == "" and r["n_dropped"] == 1 for r in out)


def test_line_dedup_min_docs_is_distinct_docs_not_occurrences(spark):
    # one doc repeating a line 10x does NOT make it boilerplate
    rows = [(1, "\n".join(["echo"] * 10))]
    rows += [(i, f"solo {i}") for i in range(2, 5)]
    out = {
        r["doc_id"]: r
        for r in line_dedup(_docs(spark, rows), min_docs=10).collect()
    }
    assert out[1]["n_dropped"] == 0
    assert out[1]["clean_text"] == "\n".join(["echo"] * 10)


def test_line_dedup_preserves_interleaved_order(spark):
    common = [(i, "bp one\nbp two") for i in range(10)]
    target = [(100, "keep a\nbp one\nkeep b\nbp two\nkeep c")]
    out = {
        r["doc_id"]: r
        for r in line_dedup(_docs(spark, common + target), min_docs=10).collect()
    }
    assert out[100]["clean_text"] == "keep a\nkeep b\nkeep c"
    assert out[100]["n_dropped"] == 2


def test_duplicate_spans_detects_misaligned_copy(spark):
    """Content-defined window selection (hash-anchor winnowing) must
    catch a shared span even when the two copies start at offsets that
    are NOT congruent mod the stride — the case fixed-offset striding
    misses ~7/8 of the time."""
    from searchengine_spark.operators.dedup import duplicate_spans

    shared = (
        "this long plagiarized paragraph was copied verbatim between "
        "two different documents at two different byte offsets and the "
        "anchor selection must still catch it"
    )  # 150+ chars → miss probability (7/8)^(len-31) ≈ 1e-7
    rows = [
        (1, "a " + shared + " tail one"),          # offset 3
        (2, "longer prefix " + shared + " tail"),  # offset 15 (Δ ∤ 8)
        (3, "completely unrelated content that shares nothing at all "
            "with either of the other two documents in this fixture"),
        (4, "tiny"),  # < window → no row
    ]
    out = {
        r["doc_id"]: r
        for r in duplicate_spans(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert 4 not in out
    assert out[1]["n_dup_windows"] >= 1 and out[2]["n_dup_windows"] >= 1
    assert out[3]["n_dup_windows"] == 0 and out[3]["dup_e4"] == 0


def test_duplicate_spans_verbatim_duplicate_docs_fully_flagged(spark):
    from searchengine_spark.operators.dedup import duplicate_spans

    # aperiodic 120-char text, identical in both docs — every KEPT
    # window is shared, so dup_e4 is exactly 10000
    t = ("the quick brown fox jumps over the lazy dog while seventeen "
         "zebras quietly watch from behind the old wooden fence posts")
    rows = [(1, t), (2, t), (3, "x" * 40)]
    out = {
        r["doc_id"]: r
        for r in duplicate_spans(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert out[1]["n_windows"] >= 1  # anchor kept at least one window
    assert out[1]["n_dup_windows"] == out[1]["n_windows"]
    assert out[1]["dup_e4"] == 10000
    assert out[3]["n_dup_windows"] == 0


def test_pii_ipv4_rejects_out_of_range_quads(spark):
    # ADVICE r3: octet range alternation — 999.999.999.999 / 256.1.1.1
    # must NOT be redacted, real addresses must
    rows = [(1, "bad 999.999.999.999 and 256.1.1.1 real 255.255.255.255 "
                "and 0.0.0.0")]
    out = pii_scrub(_docs(spark, rows)).collect()[0]
    assert out["n_ipv4s"] == 2
    assert "999.999.999.999" in out["clean_text"]
    assert "256.1.1.1" in out["clean_text"]
    assert out["clean_text"].count("<IP>") == 2


def test_pii_phone_rejects_mixed_separators(spark):
    # ADVICE r3: consistent-separator alternation (no backreference —
    # the oracle's RE2 has none) — "555-123 4567" is not a phone
    rows = [(1, "mixed 555-123 4567 no, but 555 123 4567 yes")]
    out = pii_scrub(_docs(spark, rows)).collect()[0]
    assert out["n_phones"] == 1
    assert "555-123 4567" in out["clean_text"]
    assert "<PHONE>" in out["clean_text"]


def test_line_dedup_shuffle_fallback_matches_broadcast(spark):
    # ADVICE r3: the boilerplate set is not provably bounded, so the
    # broadcast is guarded — the forced-shuffle path must be
    # result-identical to the forced-broadcast path (and to auto)
    rows = [(i, f"shared header\nunique body {i}\nshared footer")
            for i in range(12)]
    df = _docs(spark, rows)

    def run(flag):
        return {
            r["doc_id"]: (r["n_lines"], r["n_dropped"], r["clean_text"])
            for r in line_dedup(df, min_docs=10,
                                broadcast_common=flag).collect()
        }

    bcast, shuffle, auto = run(True), run(False), run(None)
    assert bcast == shuffle == auto
    assert bcast[3] == (3, 2, "unique body 3")
