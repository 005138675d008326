"""Deduplication operators for training-data pipelines: exact hash dedup,
MinHash + LSH banding, n-gram Jaccard, SimHash.

Design for 100 TB:
  * All hashing is md5 via JVM built-ins (whole-stage codegen); no Python.
  * Shingling explodes to (doc_id, shingle) — one shuffle per groupBy,
    map-side partial aggregation handled by Catalyst hash-agg.
  * LSH candidate pairs come from an equi-join on (band, minhash) — a plain
    shuffle-hash/sort-merge join on a high-cardinality key, so it scales
    without cartesian products; Jaccard is then computed only on docs that
    share at least one shingle (equi-join on shingle), never all-pairs.
  * SimHash computes the 64 bit-columns on the *vocabulary* (distinct
    tokens) and joins back — at web scale vocabulary << corpus, so the
    expensive bit decomposition runs once per distinct token.

Every operator has a DuckDB oracle twin in ``__spark_entry__`` using the
same md5/token conventions (see functions/text.py header).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F

from .text import tokens

_LOG = logging.getLogger(__name__)


def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup groups: md5 of raw text, groups with >1 member.
    At scale: one hash-agg shuffle on a uniformly distributed key."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.count(F.lit(1)).cast("long").alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


def shingles(df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word-k-gram shingles per doc: (doc_id, shingle).

    Guard: docs with fewer than k tokens produce no shingles (sequence()
    would otherwise generate a *descending* range in Spark).
    """
    parts = ", ".join(f"_toks[i - 1 + {j}]" for j in range(k))
    shingle_expr = (
        f"CASE WHEN size(_toks) < {k} THEN array() "
        f"ELSE transform(sequence(1, size(_toks) - {k - 1}), i -> concat_ws(' ', {parts})) END"
    )
    return (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), F.explode(F.expr(shingle_expr)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(sh: DataFrame, bands: int = 4, id_col: str = "doc_id") -> DataFrame:
    """MinHash signature per (doc, band): min over shingles of
    md5(band || '|' || shingle). One band per independent hash function —
    band size 1, so each band IS an LSH bucket key (collision prob = Jaccard).
    Output: (doc_id, band, minhash)."""
    banded = sh.select(
        F.col(id_col),
        F.explode(F.expr(f"sequence(0, {bands - 1})")).alias("band"),
        F.col("shingle"),
    )
    return (
        banded.select(
            F.col(id_col),
            F.col("band").cast("long").alias("band"),
            F.md5(F.concat_ws("|", F.col("band").cast("string"), F.col("shingle"))).alias("h"),
        )
        .groupBy(id_col, "band")
        .agg(F.min("h").alias("minhash"))
    )


def cap_shingle_df(sh: DataFrame, df_max: int, id_col: str = "doc_id") -> DataFrame:
    """Drop shingles whose document frequency exceeds ``df_max`` (web-scale
    stop-phrases: a shingle shared by 10^6 docs would explode the self-join
    group to ~10^12 pairs). Standard MinHashLSH practice — such a shingle
    carries no near-dup signal (any Jaccard above a useful threshold implies
    many OTHER shared shingles too).

    Implemented as a count window over shingle, not a separate agg +
    anti-join: the downstream self-join needs ``sh`` shuffled (and, for
    sort-merge, sorted) by shingle anyway, so the cap rides the exchange and
    sort the join already pays — measured faster than the uncapped query at
    sf0.1, and ~2x faster than the broadcast-anti-join form.

    Input rows are first deduplicated on (id_col, shingle) so the window
    count IS document frequency even for callers whose shingle stream
    carries repeats; for `shingles()` output (already distinct) Catalyst
    removes the redundant aggregate."""
    from pyspark.sql import Window

    w = Window.partitionBy("shingle")
    return (
        sh.dropDuplicates([id_col, "shingle"])
        .withColumn("_df", F.count(F.lit(1)).over(w))
        .where(F.col("_df") <= df_max)
        .drop("_df")
    )


def cap_hot_buckets(
    sig: DataFrame,
    bucket_max: int,
    keys: tuple[str, ...] = ("band", "minhash"),
) -> DataFrame:
    """Drop degenerate ``keys`` buckets holding more than ``bucket_max``
    docs before any bucket self-join (a bucket of B docs emits B^2/2
    pairs; such buckets only arise from stop-phrase shingles / all-zero
    signatures, which carry no near-dup signal). Count window over the
    bucket key — rides the exchange+sort the downstream self-join already
    pays (the measured-fast cap form, see cap_shingle_df). The single
    home of this cap shape: every bucket-join caller uses it."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys)
    return (
        sig.withColumn("_n", F.count(F.lit(1)).over(w))
        .where(F.col("_n") <= bucket_max)
        .drop("_n")
    )


def lsh_candidate_pairs(sig: DataFrame, bucket_max: int | None = None,
                        id_col: str = "doc_id") -> DataFrame:
    """Candidate near-dup pairs: docs sharing any (band, minhash) bucket.
    Equi-join on the bucket key — no cartesian product; skew-resistant
    because md5 buckets are uniform. ``bucket_max`` caps degenerate buckets
    via cap_hot_buckets. Output: (doc_a, doc_b) distinct."""
    if bucket_max is not None:
        sig = cap_hot_buckets(sig, bucket_max)
    a = sig.select(F.col(id_col).alias("doc_a"), "band", "minhash")
    b = sig.select(F.col(id_col).alias("doc_b"), "band", "minhash")
    return (
        a.join(b, ["band", "minhash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


# Source size above which a multiply-consumed derived frame is persisted
# instead of recomputed per consumer. Measured crossover on this box:
# at sf0.1 (~20 MB source, page-cache resident) recomputing the shingle
# subtree 3x beats caching it 2x (2.2 s vs 4.1 s warm — materialization +
# lost pipelining dominate tiny inputs); at 100 TB the 3x corpus re-read
# is the bottleneck and the cache wins. 1 GiB splits those regimes with a
# wide margin on both sides.
REUSE_MIN_SOURCE_BYTES = 1 << 30


def _source_bytes(df: DataFrame, cap: int) -> int:
    """Total bytes of the frame's backing files (early-stop at ``cap``);
    0 for non-file-backed inputs (unknown — treated as small). A sizing
    FAILURE (filesystem error) is logged before falling back to 0 —
    silently treating a huge source as small would quietly disable reuse
    and triple the corpus I/O with no trace in any log."""
    files = df.inputFiles()
    if not files:
        return 0
    from ..pipeline.job import _hadoop_fs

    total = 0
    try:
        for f in files:
            p, fs = _hadoop_fs(df.sparkSession, f)
            total += fs.getFileStatus(p).getLen()
            if total >= cap:
                return total
    except Exception as exc:
        _LOG.warning(
            "source sizing failed (%s: %s) — treating frame as small, "
            "subtree reuse disabled for this call", type(exc).__name__, exc
        )
        return 0
    return total


# Handles installed by persist_if_large, oldest first. Bounded: installing
# beyond _PERSIST_CAP evicts (unpersists) the oldest handle, so a long-lived
# session accumulates at most _PERSIST_CAP InMemoryRelations from this path
# instead of one per call forever (ADVICE r04). The cap is safe because every
# caller persists immediately before the consuming action — by the time 4
# newer persists exist, the old frame's action has long finished.
_PERSIST_CAP = 4
_PERSISTED: list[DataFrame] = []


def release_persisted() -> int:
    """Unpersist every frame persist_if_large installed and return how many
    were released. Call after the consuming action when the caller knows the
    cache won't be reused (e.g. between bench legs)."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped: nothing left to release
    return n


def persist_if_large(df: DataFrame, threshold: int = REUSE_MIN_SOURCE_BYTES) -> DataFrame:
    """Persist a derived frame that several consumers will read — but only
    when its backing source is big enough that recomputing the subtree per
    consumer costs more than materializing it once (see
    REUSE_MIN_SOURCE_BYTES for the measured crossover). Same
    metadata-only sizing idea as pipeline.job._scan_width_estimate.

    Installed caches are tracked in a bounded FIFO (``_PERSIST_CAP``):
    the oldest entry is unpersisted when the cap is exceeded, and
    ``release_persisted()`` drops them all eagerly.

    An already-cached plan is returned untouched and NOT tracked again:
    Spark's CacheManager keys by analyzed plan, so a second persist() of an
    identical plan would alias the SAME InMemoryRelation — evicting the
    older handle would silently drop the cache out from under the newer one.

    Caller contract: run the consuming action before composing more than
    ``_PERSIST_CAP`` persisted frames — eviction of a cache whose action has
    not run yet silently forfeits the reuse (the eviction is logged so the
    recompute has a trace)."""
    if _source_bytes(df, threshold) >= threshold:
        if df.is_cached:
            return df
        df = df.persist()
        _PERSISTED.append(df)
        if len(_PERSISTED) > _PERSIST_CAP:
            old = _PERSISTED.pop(0)
            try:
                old.unpersist()
                _LOG.warning(
                    "persist_if_large FIFO full (%d): evicted the oldest "
                    "cached frame — if its consuming action had not run yet, "
                    "its subtree will recompute", _PERSIST_CAP,
                )
            except Exception:
                pass  # already unpersisted / session gone
    return df


def jaccard_pairs(sh: DataFrame, min_common: int = 2, df_max: int | None = None,
                  id_col: str = "doc_id", reuse: bool | None = None) -> DataFrame:
    """n-gram Jaccard similarity for every doc pair sharing >= min_common
    shingles. The shingle equi-join only materializes co-occurring pairs;
    per-doc set sizes are broadcast back via two cheap aggregations.

    ``df_max`` applies cap_shingle_df first, so Jaccard is computed over the
    DF-capped shingle space (numerator AND denominators) — the self-join
    group per shingle is then bounded by df_max at any corpus size.

    ``reuse`` persists the (capped) shingle frame: three consumers read it
    (per-doc sizes + both self-join sides), and without the cache each
    rebuilds the whole scan -> tokenize -> explode -> distinct -> window
    subtree — at 100 TB that is 3x the corpus I/O and 3x the tokenize
    CPU for identical bytes. The default ``None`` decides by source size
    (persist_if_large): big sources cache, small ones recompute — the
    measured-faster choice on BOTH sides of the crossover. The
    InMemoryRelation keeps the window's hash(shingle) outputPartitioning
    visible to Catalyst, so the self-join adds no new exchange over the
    cached side, and Spark's cache manager keys on the canonicalized plan,
    so sibling queries capping the same source share one entry.
    Output: (doc_a, doc_b, n_common, n_a, n_b, jaccard)."""
    if df_max is not None:
        sh = cap_shingle_df(sh, df_max, id_col)
    if reuse is None:
        sh = persist_if_large(sh)
    elif reuse:
        sh = sh.persist()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            "n_a",
            "n_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


def dedup_components(
    pairs: DataFrame,
    max_iters: int = 20,
    strict: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over near-duplicate candidate pairs: the step
    that turns pairwise matches into dedup GROUPS (keep one canonical doc
    per component, drop the rest). Iterative min-label propagation — each
    node adopts the smallest label among itself and its neighbors until no
    label changes. Output: (doc_id, component) where component = min doc_id
    reachable in the undirected candidate graph.

    Scale design: each iteration does a neighbor-min step (join + hash-agg,
    one shuffle) AND a pointer-jumping step (label := label-of-label), so
    convergence is O(log diameter) — 20 iterations covers ~10^6-hop chains.
    Lineage is truncated per iteration with localCheckpoint so the plan does
    not grow exponentially; the driver-side convergence check moves one
    count per iteration, not data. The driver loop is the standard Spark
    shape for iterative graph algorithms (GraphFrames' connectedComponents
    alternates the same two steps internally).

    ``strict=True`` (default) raises on non-convergence so a silently
    under-merged grouping can never reach the manifest; ``strict=False``
    returns the partial labels with a warning for callers that prefer
    degrade-over-abort deep inside a long extract run. Pass a dict as
    ``stats`` to receive {"iterations", "converged", "last_changed"}.
    """
    edges_fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = edges_fwd.unionByName(
        edges_fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    converged = False
    iterations = 0
    changed = -1
    for iterations in range(1, max_iters + 1):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("n_min"))
        )
        stepped = labels.join(
            neighbor_min, labels.doc_id == neighbor_min.src, "left"
        ).select(
            "doc_id",
            F.least(
                F.col("component"), F.coalesce("n_min", F.col("component"))
            ).alias("component"),
            F.col("component").alias("_old"),
        )
        # pointer jumping: component := component(component). Labels are
        # always node ids (mins over node ids), so the self-join resolves;
        # this halves the remaining chain length every iteration.
        mapping = stepped.select(
            F.col("doc_id").alias("m_node"), F.col("component").alias("m_comp")
        )
        new_labels = (
            stepped.join(mapping, stepped.component == mapping.m_node, "left")
            .select(
                "doc_id",
                F.coalesce("m_comp", "component").alias("component"),
                "_old",
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("component") != F.col("_old")).count()
        # rebinding drops the previous checkpoint's last reference; the
        # ContextCleaner then releases its cached blocks, so at most two
        # label snapshots are live at once (not one per iteration)
        labels = new_labels.drop("_old")
        if changed == 0:
            converged = True
            break
    if not converged:
        msg = (
            f"dedup_components did not converge in {max_iters} iterations "
            f"({changed} labels still changing) — the candidate graph is far "
            "larger-diameter than any near-dup clustering should produce; "
            "raise max_iters only after checking the upstream candidate caps"
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg + " — returning PARTIAL labels (strict=False)")
    if stats is not None:
        stats.update(
            iterations=iterations, converged=converged, last_changed=changed
        )
    return labels


def simhash_bits(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash, emitted long-form as (doc_id, bit_idx, bit).

    Token hash bits come from the first 16 hex chars of md5(token): bit j is
    bit (3 - j%4) of hex digit j//4. Per-doc bit j = 1 iff the token-count
    weighted sum of (2*bit - 1) is > 0. The bit table is computed on the
    distinct-token vocabulary and joined back (vocab << corpus at scale).
    """
    doc_tokens = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    vocab_bits = (
        doc_tokens.select("token")
        .distinct()
        .select(
            "token",
            F.explode(F.expr("sequence(0, 63)")).alias("bit_idx"),
        )
        .withColumn(
            "digit",
            F.expr("instr('0123456789abcdef', substring(md5(token), CAST(bit_idx / 4 AS INT) + 1, 1)) - 1"),
        )
        .withColumn("contrib", F.expr("2 * (shiftright(digit, 3 - bit_idx % 4) % 2) - 1"))
        .select("token", F.col("bit_idx").cast("long").alias("bit_idx"), "contrib")
    )
    return (
        doc_tokens.join(vocab_bits, "token")
        .groupBy(id_col, "bit_idx")
        .agg(F.sum(F.col("cnt") * F.col("contrib")).alias("s"))
        .select(
            F.col(id_col),
            "bit_idx",
            F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("bit"),
        )
    )


def simhash_signature(bits: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fold the long-form (doc_id, bit_idx, bit) table from
    :func:`simhash_bits` into one signed 64-bit signature per doc.
    bit_or of disjoint shifted bits — bit 63 lands in the sign bit, exact
    in two's complement, and bit_or cannot overflow the way SUM of 2^63
    would. Output: (doc_id, simhash BIGINT)."""
    return bits.groupBy(id_col).agg(
        F.expr("bit_or(shiftleft(bit, CAST(bit_idx AS INT)))").alias("simhash")
    )


def simhash_signatures_direct(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Same signatures as ``simhash_signature(simhash_bits(df))``, one
    shuffle instead of three explosions: the md5 hex is computed once per
    DISTINCT token, joined back to the (doc, token, cnt) counts, and all
    64 bit sums fold inside a single hash-agg (64 conditional-sum columns,
    whole-stage codegen). The long form shuffles |doc,token| x 64 rows
    through the (doc, bit) aggregate — measured ~3x slower end-to-end at
    sf0.1 (11.2 -> 3.7 s warm for simhash_near_dups). Computing the hex
    inline per (doc, token) row instead of the vocab join was measured a
    wash (1.1-1.8 s vs 1.1-1.4 s for the signature leg alone): the join
    trades |doc,token| md5 evaluations for one small distinct — kept
    because vocabulary << corpus grows ever more true at scale.
    Bit definition identical to simhash_bits (bit j from hex digit j//4);
    equality with the folded form is pinned by a test."""
    doc_tokens = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    vocab = (
        doc_tokens.select("token").distinct()
        .select("token", F.substring(F.md5("token"), 1, 16).alias("_hex"))
    )
    joined = doc_tokens.join(vocab, "token")
    # per-bit signed sum: s_j = sum(cnt * (2*bit_j - 1)); doc bit j = s_j > 0
    terms = []
    for j in range(64):
        bit = (
            f"((instr('0123456789abcdef', substring(_hex, {j // 4 + 1}, 1)) - 1)"
            f" >> {3 - j % 4}) % 2"
        )
        s = f"sum(cnt * (2 * ({bit}) - 1))"
        # shiftleft(1L, 63) wraps to min-long; the total stays in BIGINT
        # range (min-long + at most 2^63 - 1), so the sum is exact
        terms.append(f"CASE WHEN {s} > 0 THEN shiftleft(1L, {j}) ELSE 0L END")
    sig = " + ".join(terms)
    return joined.groupBy(id_col).agg(F.expr(sig).alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    bucket_max: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-duplicate pairs with EXACT recall at distance
    ``max_hamming`` via pigeonhole banding: the 64-bit signature splits
    into ``n_bands`` contiguous (64/n_bands)-bit band keys; any pair
    within hamming distance < n_bands must agree exactly on at least one
    band, so a (band, band_key) equi-join finds every such pair — no
    cartesian product, cost = sum of squared band-bucket sizes. Each
    candidate is then re-checked with the exact
    ``bit_count(sig_a ^ sig_b)``. Requires ``max_hamming < n_bands`` for
    the guarantee (asserted).

    ``bucket_max`` caps degenerate band buckets (e.g. the all-zero
    signature shared by every token-free doc) with the same count-window
    form as cap_hot_buckets — it rides the join's own exchange+sort.
    Output: (doc_a, doc_b, hamming), distinct pairs.
    """
    assert max_hamming < n_bands, "pigeonhole guarantee needs max_hamming < n_bands"
    width = 64 // n_bands
    mask = (1 << width) - 1
    sig = simhash_signatures_direct(df, text_col, id_col)
    bands = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}), "
                # mask AFTER the shift: >> is arithmetic, the mask clears
                # the sign extension from the top band
                f"b -> shiftright(simhash, b * {width}) & {mask}L)"
            )
        ).alias("band", "band_key"),
    )
    if bucket_max is not None:
        bands = cap_hot_buckets(bands, bucket_max, keys=("band", "band_key"))
    a = bands.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sig_a"),
        "band", "band_key",
    )
    b = bands.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sig_b"),
        "band", "band_key",
    )
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
        .select(
            "doc_a",
            "doc_b",
            F.expr("bit_count(sig_a ^ sig_b)").cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def winnow_fingerprints(df: DataFrame, k: int = 3, window: int = 4,
                        text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. local algorithm):
    hash every word-k-gram in order, slide a window of ``window`` hashes,
    keep each window's minimum, dedupe. Guarantees any shared run of
    k+window-1 tokens between two docs shares a fingerprint.

    One shuffle (the per-doc window sort); at scale the ordered shingle
    stream comes straight off the tokenizer, so cost is O(tokens) per doc.
    Output: (doc_id, fp) distinct.
    """
    from pyspark.sql import Window

    parts = ", ".join(f"_toks[i - 1 + {j}]" for j in range(k))
    shingle_expr = (
        f"CASE WHEN size(_toks) < {k} THEN array() "
        f"ELSE transform(sequence(1, size(_toks) - {k - 1}), i -> concat_ws(' ', {parts})) END"
    )
    hashed = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), F.posexplode(F.expr(shingle_expr)).alias("pos", "sh"))
        .select(F.col(id_col), "pos", F.md5("sh").alias("h"))
    )
    w = Window.partitionBy(id_col).orderBy("pos").rowsBetween(-(window - 1), 0)
    return (
        hashed.withColumn("fp", F.min("h").over(w))
        .where(F.col("pos") >= window - 1)  # full windows only
        .select(id_col, "fp")
        .distinct()
    )
