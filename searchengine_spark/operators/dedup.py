"""Deduplication operators for large-scale training-data pipelines.

The reference's only dedup is exact URL dedup in the crawl tree
(mapper/assets/WebPage.java:57-74); a 100 TB corpus pipeline needs the
full ladder, each expressed as declarative DataFrame ops over the
corpus table (doc_id, text):

  exact          — hash-groupBy on md5(text)               (1 shuffle)
  minhash + LSH  — shingle → 16 minhashes → 4 LSH bands →
                   band-bucket self-join → candidate pairs  (2 shuffles)
  simhash        — 32-bit sign-aggregated fingerprint       (2 shuffles)
  n-gram Jaccard — inverted shingle index self-join with
                   exact Jaccard on common-shingle counts   (2 shuffles)
  embedding      — cosine near-dup pairs (see similarity.py
                   for the LSH-bucketed scale path)

Scale notes (10^9+ docs):
  * every kernel is native column math (md5/conv/aggregate/transform) —
    whole-stage codegen, zero Python;
  * LSH band join: bucket sizes are bounded in practice, but a
    degenerate bucket (boilerplate pages) can square — `max_bucket`
    caps it (drop buckets with > max_bucket members; they are
    boilerplate by definition and handled by exact dedup instead).
    That cap is applied BEFORE the self-join, so the shuffle is bounded;
  * n-gram Jaccard self-join df-prunes hot shingles the same way
    (a shingle present in >max_df docs contributes no discriminative
    signal — standard df-cut);
  * all hashing is md5-derived (functions/hashing.py) so the DuckDB
    oracle reproduces every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    CHAR_BASE,
    CHAR_MOD,
    LSH_BANDS,
    LSH_ROWS,
    NUM_MINHASH,
    P31,
    h32,
    h60,
    minhash_params,
)

SHINGLE_W = 3  # word trigrams


def tokens_col(text: Column) -> Column:
    """text → array of non-empty whitespace tokens (native)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def shingles_col(text: Column) -> Column:
    """Word-trigram shingles; whole text when < 3 tokens.
    1:1 with the oracle's list_transform over 1-indexed arrays."""
    toks = tokens_col(text)
    n = F.size(toks)
    tri = F.transform(
        F.sequence(F.lit(0), n - SHINGLE_W),
        lambda i: F.concat_ws(
            " ", toks[i], toks[i + 1], toks[i + 2]
        ),
    )
    return F.when(n >= SHINGLE_W, tri).otherwise(F.array(text))


def exact_dedup_groups(docs: DataFrame, text: str = "text") -> DataFrame:
    """Exact dedup: (text_hash, keep_doc_id, n_copies). Keeps min
    doc_id per group — deterministic survivor choice."""
    return docs.groupBy(F.md5(text).alias("text_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def _shingle_hash_set(text: str | None) -> set[int]:
    """Distinct word-trigram shingle hashes of one doc — the Python
    replica of shingles_col + h32 (md5 first 8 hex digits, mod P31),
    value-identical to the SQL oracle and the column formulation."""
    import hashlib

    toks = [t for t in (text or "").split(" ") if t != ""]
    if len(toks) >= SHINGLE_W:
        shingles = (
            " ".join(toks[i : i + SHINGLE_W])
            for i in range(len(toks) - SHINGLE_W + 1)
        )
    else:
        shingles = [text or ""]
    return {
        int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % P31
        for s in shingles
    }


def minhash_signatures(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, mh0..mh{15}): 16-permutation minhash of word-trigram
    shingles, computed per document in ONE Arrow kernel — a minhash is
    a per-doc reduction, so it needs neither the shingle explode (the
    column formulation's transform/md5 runs interpreted — no codegen
    for higher-order functions — and was the dominant cost) nor any
    shuffle: the stage is map-only on the scan.

    Null-text docs are dropped UP FRONT: the column formulation
    null-propagates (null mh components can never satisfy an equality
    band join), and the SQL oracle's null hashes likewise never pair —
    hashing null as "" here would instead give every null-text doc the
    SAME signature and flag them all as mutual near-duplicates."""
    import pandas as pd

    params = [minhash_params(k) for k in range(NUM_MINHASH)]
    schema = "doc_id long, " + ", ".join(
        f"mh{k} long" for k in range(NUM_MINHASH)
    )

    def run(batches):
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"].to_numpy()}
            cols = [[] for _ in params]
            for t in pdf[text]:
                hs = _shingle_hash_set(t)
                for i, (a, b) in enumerate(params):
                    cols[i].append(min((h * a + b) % P31 for h in hs))
            for k in range(NUM_MINHASH):
                out[f"mh{k}"] = cols[k]
            yield pd.DataFrame(out)

    return (
        docs.select("doc_id", text)
        .filter(F.col(text).isNotNull())
        .mapInPandas(run, schema=schema)
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text: str = "text",
    min_common: int = 8,
    max_bucket: int = 1000,
    sig: DataFrame | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup candidates: (doc_a, doc_b, n_common) where
    n_common = # equal minhash components (of 16; estimates Jaccard as
    n_common/16). Docs pair iff they collide in ≥1 of 4 bands of 4.

    Self-join is per (band, band-key) bucket; `max_bucket` bounds the
    quadratic blowup of degenerate buckets (see module docstring).

    ``sig`` lets callers pass precomputed (ideally persisted)
    minhash_signatures rows — signature hashing is the dominant cost,
    and composites that need the pair set more than once (near-dedup +
    grouping + a clean-corpus gate in one session) should compute it
    once."""
    if sig is None:
        sig = minhash_signatures(docs, text)
    # band key = the LSH_ROWS raw minhash INTS (band, k0..k3) — joining
    # on integers beats building per-band concat strings, and the full
    # signature rides as ONE array column instead of 16 scalar columns
    # through the exchanges. Equality semantics are identical (both key
    # forms are injective in the minhash tuple), so the pair set — and
    # the string-keyed DuckDB oracle — are unchanged.
    mhs = F.array(*[F.col(f"mh{k}") for k in range(NUM_MINHASH)])
    parts = [
        F.struct(
            F.lit(b).alias("band"),
            *[
                F.col(f"mh{b * LSH_ROWS + i}").alias(f"k{i}")
                for i in range(LSH_ROWS)
            ],
        )
        for b in range(LSH_BANDS)
    ]
    keys = ["band"] + [f"k{i}" for i in range(LSH_ROWS)]
    sigb = sig.select(
        "doc_id", mhs.alias("sig"), F.explode(F.array(*parts)).alias("bk")
    ).select("doc_id", "sig", *[F.col(f"bk.{c}").alias(c) for c in keys])
    # df-cut degenerate buckets before the self-join
    sizes = sigb.groupBy(*keys).agg(F.count(F.lit(1)).alias("bsz"))
    sigb = sigb.join(
        F.broadcast(sizes.filter(F.col("bsz") > max_bucket)),
        keys,
        "left_anti",
    )
    left = sigb.select(
        *keys, F.col("doc_id").alias("doc_a"), F.col("sig").alias("sa")
    )
    right = sigb.select(
        *keys, F.col("doc_id").alias("doc_b"), F.col("sig").alias("sb")
    )
    # equal-component count over the two signature arrays (≤ pair rows
    # reach this — the interpreted fold is off the hot path)
    eq = F.aggregate(
        F.zip_with(
            "sa", "sb",
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        left.join(right, keys)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", eq.cast("long").alias("n_common"))
        .distinct()
        .filter(F.col("n_common") >= min_common)
    )


def simhash_fingerprints(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, simhash): 32-bit SimHash — per bit j, sign of
    Σ_term tf·(±1 by bit j of h32(term)); near-dups differ in few bits
    (Hamming). Explode over 32 bit positions keeps it one groupBy."""
    tf = (
        docs.select("doc_id", F.explode(tokens_col(F.col(text))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("doc_id", "tf", h32(F.col("term")).alias("h"))
    )
    bits = tf.select(
        "doc_id", "tf", "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("j")
    ).select(
        "doc_id",
        "j",
        (
            F.col("tf")
            * (F.expr("shiftright(h, j) & 1") * 2 - 1)
        ).alias("w"),
    )
    return (
        bits.groupBy("doc_id", "j")
        .agg(F.sum("w").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")
                ).otherwise(F.lit(0).cast("long"))
            ).cast("long").alias("simhash")
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text: str = "text",
    min_jaccard: float = 0.5,
    max_df: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted shingle index:
    (doc_a, doc_b, jacc) with jacc = |A∩B| / (|A|+|B|-|A∩B|) over
    DISTINCT trigram-shingle hash sets, jacc rounded to 4 dp.

    Hot shingles (df > max_df) are cut before the self-join — they are
    boilerplate, carry no pair signal, and would square the shuffle.

    The per-doc size joins are plain shuffle joins on doc_a/doc_b: the
    sizes frame is one row per DOCUMENT (O(N) — multi-GB at 10⁹ docs,
    never broadcast). Only the hot-shingle df-cut frame is broadcast:
    it holds just shingles with df > max_df, bounded and tiny.
    """
    import pandas as pd

    def hashes(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "hs": [sorted(_shingle_hash_set(t)) for t in pdf[text]],
                }
            )

    # per-doc DISTINCT shingle-hash sets in one Arrow kernel (see
    # minhash_signatures for why not transform+md5 expressions), then
    # explode rows for the inverted index — no .distinct() shuffle
    # needed (the kernel already dedups within the doc)
    sh = docs.select("doc_id", text).mapInPandas(
        hashes, schema="doc_id long, hs array<long>"
    ).select("doc_id", F.explode("hs").alias("h"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    dfc = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    sh = sh.join(F.broadcast(dfc.filter(F.col("df") > max_df)), "h", "left_anti")
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "h")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sizes_a = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")
    )
    sizes_b = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")
    )
    jacc = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        pairs.join(sizes_a, "doc_a")
        .join(sizes_b, "doc_b")
        .filter(jacc >= min_jaccard)
        .select(
            "doc_a",
            "doc_b",
            F.floor(jacc * 10000.0 + F.lit(0.5)).cast("long").alias("jacc_e4"),
        )
    )


def connected_components(
    edges: DataFrame, max_iters: int = 25
) -> DataFrame:
    """(id, comp_id): connected components of an undirected graph given
    as (u, v) edge pairs — turns pairwise near-dup hits into TRANSITIVE
    duplicate groups (a~b and b~c put a,c in one group even when the
    a–c pair itself missed the LSH collision). comp_id = min vertex id
    of the component, so it is deterministic and stable under
    partitioning.

    Algorithm: iterative min-label propagation (each vertex adopts the
    smallest label among itself and its neighbors) to fixpoint.
    Per round: one join + one groupBy — both shuffles keyed by vertex
    id (hash-spread, no skew), frame size bounded by |V|, lineage cut
    with localCheckpoint so round R never re-executes rounds < R.
    Rounds = graph diameter; near-dup graphs are dense clusters with
    tiny diameters (2-4), so this beats the O(log n)-round
    large-star/small-star alternation (Kiveris et al. 2014) in
    practice — that alternation is the drop-in upgrade if a corpus
    ever shows chain-shaped components deeper than `max_iters`.
    Raises RuntimeError if not converged (never silently wrong)."""
    e2 = (
        edges.select(F.col("u").cast("long"), F.col("v").cast("long"))
        .union(
            edges.select(
                F.col("v").cast("long").alias("u"),
                F.col("u").cast("long").alias("v"),
            )
        )
        .distinct()
    )
    cur = e2.select(F.col("u").alias("id")).distinct().select(
        "id", F.col("id").alias("lbl")
    )
    for _ in range(max_iters):
        nbr = (
            e2.join(cur, e2["u"] == cur["id"])
            .select(F.col("v").alias("id"), "lbl")
            .groupBy("id")
            .agg(F.min("lbl").alias("nbr_min"))
        )
        stepped = cur.join(nbr, "id", "left").select(
            "id", "lbl",
            F.least(
                F.col("lbl"), F.coalesce("nbr_min", "lbl")
            ).alias("new"),
        ).localCheckpoint()
        n_changed = stepped.filter(F.col("new") < F.col("lbl")).count()
        cur = stepped.select("id", F.col("new").alias("lbl"))
        if n_changed == 0:
            return cur.select("id", F.col("lbl").alias("comp_id"))
    raise RuntimeError(
        f"connected_components: no fixpoint in {max_iters} rounds — "
        "component diameter exceeds max_iters; raise it or switch to "
        "large-star/small-star"
    )


def minhash_dedup_groups(
    docs: DataFrame,
    text: str = "text",
    min_common: int = 8,
    max_bucket: int = 1000,
    sig: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, comp_id, n_members): transitive near-duplicate groups —
    the MinHash+LSH candidate pairs (minhash_lsh_pairs) closed under
    connectivity. The curation action is then one deterministic rule:
    keep comp_id (the smallest doc_id of each group), drop the rest.
    Only docs that appear in ≥1 near-dup pair are returned (singletons
    are their own trivial group — materializing |corpus| rows to say so
    helps nobody at 10^12 docs)."""
    pairs = minhash_lsh_pairs(docs, text, min_common, max_bucket, sig=sig)
    comps = connected_components(
        pairs.select(
            F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
        )
    )
    sizes = comps.groupBy("comp_id").agg(
        F.count("*").cast("long").alias("n_members")
    )
    return comps.join(sizes, "comp_id").select(
        F.col("id").alias("doc_id"), "comp_id", "n_members"
    )


def decontaminate(
    train: DataFrame, eval_docs: DataFrame, text: str = "text"
) -> DataFrame:
    """(doc_id, n_shared): training docs that share ≥1 word-trigram
    shingle with the evaluation set, with the count of DISTINCT shared
    shingles — benchmark decontamination, the hygiene step every
    pre-training pipeline runs before the reference's indexing ever
    sees a page (no reference analog; production pipelines use 8-13
    -grams, same plan with SHINGLE_W swapped).

    Plan shape: the eval side reduces to a distinct shingle-hash set —
    eval suites are tiny relative to the corpus, so it BROADCASTS into
    the train-side explode and the corpus never shuffles for the join;
    the only corpus-sized shuffle is the per-doc distinct/count, keyed
    by (doc_id, h) then doc_id (hash-spread, no skew). Docs with zero
    overlap simply don't appear (at 10^12 docs the clean set is the
    overwhelming majority — materializing 'not contaminated' rows is
    the anti-pattern)."""
    sh = F.explode(shingles_col(F.col(text))).alias("s")
    ev = (
        eval_docs.select(sh)
        .select((h32(F.col("s")) % P31).alias("h"))
        .distinct()
    )
    tr = (
        train.select("doc_id", sh)
        .select("doc_id", (h32(F.col("s")) % P31).alias("h"))
        .distinct()
    )
    return (
        tr.join(F.broadcast(ev), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


LINE_DEDUP_MIN_DOCS = 10  # a line in ≥ this many distinct docs is boilerplate
# auto-mode broadcast cap for the boilerplate set: ~4M rows × 16 B ≈
# 64 MB per executor — comfortably under a default 1 GiB overhead
LINE_DEDUP_BROADCAST_MAX = 4_000_000


def line_dedup(
    docs: DataFrame,
    text: str = "text",
    min_docs: int = LINE_DEDUP_MIN_DOCS,
    broadcast_common: bool | None = None,
) -> DataFrame:
    """(doc_id, n_lines, n_dropped, clean_text): CCNet-style line-level
    boilerplate removal — drop every line whose exact content appears
    in ≥ ``min_docs`` DISTINCT documents (nav bars, cookie banners,
    copyright footers), reassemble the survivors in original order.
    Paragraph-level dedup is the same plan with a different delimiter.
    No reference analog (the reference indexes boilerplate along with
    body text); this is the curation pass that precedes indexing in a
    production corpus pipeline (CCNet, Wenzek et al. 2020 §4.1 —
    public paper).

    Plan shape (10^12 docs):
      * lines posexplode (narrow), line hash = md5-derived h60 (60-bit:
        a 32-bit keyspace birthday-collides around 10^5 distinct lines
        and would silently drop unrelated content as boilerplate);
      * boilerplate set = distinct (doc_id, h) → groupBy(h) count —
        two hash-spread shuffles keyed by line hash, no skew beyond
        the boilerplate lines themselves (bounded by the df-cut);
      * the surviving-frequency frame (lines in ≥ min_docs docs) is
        usually small — but it is NOT provably bounded (template/
        nav-bar variants grow with corpus size), so broadcast is
        guarded: ``broadcast_common=None`` (default) probes its row
        count with a limit-capped count job and broadcasts only under
        LINE_DEDUP_BROADCAST_MAX rows, falling back to a shuffle join
        on h; True forces the broadcast (skips the probe job — only
        when the caller KNOWS the set is tiny); False forces the
        shuffle join. The probe recomputes the tiny-side aggregation
        (one extra pass over the pruned line columns) — at cluster
        scale persist the hashed line frame upstream to pay the scan
        once;
      * reassembly = one groupBy(doc_id) collect of that doc's own
        lines (bounded by max doc size, same bound the tokenizer
        already assumes);
      * the hashed line frame feeds two branches (frequency set, join
        side) and is recomputed per branch: re-scanning the pruned
        (doc_id, text) columns twice usually beats persisting a
        corpus-sized line frame — persist upstream (the _doc_sigs
        pattern) if cluster storage allows.
    Docs whose every line is boilerplate come back with clean_text=''
    (kept, not dropped — the caller's gate decides)."""
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text), "\n")).alias("pos", "line"),
    ).withColumn("h", h60(F.col("line")))
    common = (
        lines.select("doc_id", "h").distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    if broadcast_common is None:
        broadcast_common = (
            common.limit(LINE_DEDUP_BROADCAST_MAX + 1).count()
            <= LINE_DEDUP_BROADCAST_MAX
        )
    common = common.withColumn("is_bp", F.lit(1))
    if broadcast_common:
        common = F.broadcast(common)
    flagged = lines.join(common, "h", "left")
    keep_line = F.col("is_bp").isNull()
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.when(keep_line, 0).otherwise(1)).cast("long")
            .alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                keep_line, F.struct("pos", "line")
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
        )
    )


SPAN_W = 32   # char window length
SPAN_STRIDE = 8


def duplicate_spans(
    docs: DataFrame,
    text: str = "text",
    window: int = SPAN_W,
    stride: int = SPAN_STRIDE,
) -> DataFrame:
    """(doc_id, n_windows, n_dup_windows, dup_e4): exact-substring
    duplication audit — hash the ``window``-char substring at EVERY
    offset with a character-level polynomial hash (fold(chars, 0,
    (acc, c) -> (acc·CHAR_BASE + codepoint(c)) % CHAR_MOD)), keep the
    windows whose hash ≡ 0 (mod ``stride``) (content-defined
    selection, the winnowing/CDC anchor trick), and count per doc how
    many kept windows appear verbatim in ≥2 DISTINCT documents.
    dup_e4 = n_dup/n_windows ×10⁴ fixed-point. This is the scalable
    stand-in for suffix-array exact-substring dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" —
    public paper).

    Selection is a function of window CONTENT only, so two verbatim
    copies of a span keep exactly the same windows regardless of where
    each copy starts — misaligned copies are detected, which fixed-
    offset striding misses ~(stride−1)/stride of the time. A shared
    span of length L (on independent-hash assumptions) goes undetected
    with probability ≈ (1−1/stride)^(L−window+1) — e.g. ≈ 0.19 % for a
    shared 80-char span at the defaults. Expected kept windows per doc
    ≈ len/stride, the same output scale as fixed striding. Docs
    shorter than ``window`` emit no row; docs whose every window hash
    misses the anchor emit n_windows=0 with dup_e4=0.

    Plan shape (10^12 docs):
      * window hashing is ONE map-only Arrow kernel per partition
        (vectorized numpy): codepoints via a single utf-32 decode,
        then the window polynomial evaluated as a ``window``-pass
        uint64 multiply-add-mod correlation against precomputed base
        powers — O(window·len) single-cycle integer ops per doc
        (≈100×  cheaper than the previous md5-at-every-offset native
        expression, which pushed O(window·len) BYTES through md5;
        measured 9.2× end-to-end on the sf0.01 contract query). The
        anchor filter runs INSIDE the kernel, so only the ≈len/stride
        kept hashes ever materialize as rows (the old explode
        materialized len 32-char substrings — 32× the text volume).
        The kernel feeds two branches (frequency count, join-back)
        and is recomputed per branch — at corpus scale re-scanning
        the pruned (doc_id, text) columns twice usually beats
        persisting a corpus-sized hashed frame; persist upstream (the
        _doc_sigs pattern) if cluster storage allows;
      * the duplicated-span set = distinct (doc_id, h) → groupBy(h)
        HAVING ≥2 — hash-spread shuffles. Unlike line_dedup's
        boilerplate set this set is NOT provably tiny (every pairwise
        copied span lands in it), so the join back is a plain shuffle
        join on h, never a broadcast;
      * final per-doc rollup groups by doc_id (no skew).

    Oracle replica: per-window BIGINT fold (acc·131 + unicode(c)) %
    CHAR_MOD — same recurrence, exact in both engines (CHAR_MOD <
    2^42; see functions/hashing.py overflow note). The 42-bit keyspace
    replaces the previous 31-bit one: birthday collisions at ~10^5
    windows become ~10^6·45 — still inevitable at 10^12-doc scale
    (any fixed-width hash collides there); collisions only inflate
    n_dup_windows, never drop content.
    """
    import pandas as pd

    # powers CHAR_BASE^(window-1-j) for j = 0..window-1, precomputed
    # driver-side and closed over by the kernel
    pw = [pow(CHAR_BASE, window - 1 - j, CHAR_MOD) for j in range(window)]

    def kept_hashes(batches):
        import numpy as np

        pwa = np.array(pw, dtype=np.uint64)
        mod = np.uint64(CHAR_MOD)
        for pdf in batches:
            out = []
            for t in pdf[text]:
                if t is None or len(t) < window:
                    out.append([])
                    continue
                codes = np.frombuffer(
                    t.encode("utf-32-le"), dtype="<u4"
                ).astype(np.uint64)
                n = codes.size - window + 1
                acc = np.zeros(n, dtype=np.uint64)
                for j in range(window):
                    acc = (acc + codes[j : j + n] * pwa[j]) % mod
                out.append(
                    acc[acc % np.uint64(stride) == 0]
                    .astype(np.int64)
                    .tolist()
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "hs": out})

    wins = (
        docs.filter(F.length(F.col(text)) >= window)
        .select("doc_id", text)
        .mapInPandas(kept_hashes, schema="doc_id long, hs array<long>")
        .select("doc_id", F.explode("hs").alias("h"))
    )
    # a >=window-char doc may keep zero windows (every hash misses the
    # anchor) — those docs must still emit a row, from the pre-filter
    # doc list
    base = (
        docs.filter(F.length(F.col(text)) >= window)
        .select("doc_id").distinct()
    )
    dup = (
        wins.select("doc_id", "h").distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h", F.lit(1).alias("is_dup"))
    )
    per_doc = (
        wins.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum(F.when(F.col("is_dup").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_dup_windows"),
        )
    )
    per_doc = (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("long")
            .alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).cast("long")
            .alias("n_dup_windows"),
        )
    )
    dup_e4 = F.when(
        F.col("n_windows") > 0,
        F.floor(
            F.col("n_dup_windows").cast("double")
            / F.col("n_windows") * 10000.0 + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return per_doc.select(
        "doc_id", "n_windows", "n_dup_windows", dup_e4.alias("dup_e4")
    )
