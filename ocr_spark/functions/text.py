"""Text-analysis operators for large-scale training-data pipelines:
tokenization, quality scoring, language ID, document fingerprinting.

Everything here is JVM-side ``pyspark.sql.functions`` (whole-stage codegen,
no Python in the hot path) so it scales linearly with executors; each
operator has an ANSI-SQL twin in ``__spark_entry__.oracle_sql`` that DuckDB
verifies value-for-value.

Conventions shared with the oracles (do not change one side only):
  * tokens  = split(trim(text), '\\s+')  — single-space semantics
  * all derived integer columns are cast to BIGINT
  * ratios are computed as CAST(a AS DOUBLE)/b — bit-deterministic division
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves 'pd.Series' hints here
from pyspark.sql import Column, DataFrame, functions as F

# marker stopwords per language for the heuristic language IDer; deliberately
# tiny and fixed so the SQL twin stays readable. Tie-break: language list order.
LANG_MARKERS = {
    "en": ["the", "a", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "fr": ["le", "la", "de", "et", "les", "est"],
}

STOPWORDS = LANG_MARKERS["en"]

PUNCT_CLASS = r"[.!?,;:]"


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def _n_marker_hits(toks: str, lang: str) -> str:
    arr = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"size(filter({toks}, t -> array_contains(array({arr}), lower(t))))"


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(F.transform(t, lambda x: F.lower(x)))).cast("long").alias("n_distinct_tokens"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality features: length, punctuation count, stopword count/ratio,
    mean token length — the standard cheap filters before expensive dedup."""
    d = df.select(
        F.col(id_col),
        F.col(text_col).alias("_t"),
        tokens(F.col(text_col)).alias("_toks"),
    )
    n_tokens = F.size("_toks").cast("long")
    n_chars = F.length("_t").cast("long")
    n_punct = (F.length("_t") - F.length(F.regexp_replace("_t", PUNCT_CLASS, ""))).cast("long")
    n_stop = F.expr(_n_marker_hits("_toks", "en")).cast("long")
    token_chars = F.expr("aggregate(_toks, 0L, (acc, t) -> acc + length(t))")
    return d.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stop"),
        (n_stop.cast("double") / n_tokens).alias("stop_ratio"),
        (token_chars.cast("double") / n_tokens).alias("mean_token_len"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: marker-stopword hit counts per language,
    argmax with deterministic tie-break (language declaration order, then
    'und' when all scores are zero)."""
    d = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    scores = {lang: F.expr(_n_marker_hits("_toks", lang)).cast("long") for lang in LANG_MARKERS}
    out = d
    for lang, s in scores.items():
        out = out.withColumn(f"s_{lang}", s)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_MARKERS])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # first language reaching the max wins
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    return out.select(
        F.col(id_col),
        pred.alias("lang_pred"),
        *[F.col(f"s_{lang}") for lang in LANG_MARKERS],
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: md5 over whitespace-normalized lowercased text
    (exact-dup key) and over the first 3 tokens (crude near-dup prefix key)."""
    d = df.select(F.col(id_col), F.col(text_col).alias("_t"), tokens(F.col(text_col)).alias("_toks"))
    norm = F.lower(F.regexp_replace(F.trim("_t"), r"\s+", " "))
    prefix = F.concat_ws(" ", F.slice("_toks", 1, 3))
    return d.where(F.size("_toks") >= 3).select(
        F.col(id_col),
        F.md5(norm).alias("fp_norm"),
        F.md5(prefix).alias("fp_prefix3"),
    )


# --------------------------------------------------------------------------
# n-gram language ID (the statistical complement to the stopword heuristic
# above). Profiles are tiny in-code char-trigram frequency tables built from
# the deterministic seed sentences below — no external data, reproducible.
# Scoring is vectorized: one pass hashing all trigrams of a batch into the
# profile space, then a dot product per language.
# --------------------------------------------------------------------------

_LANG_SEED_TEXT = {
    "en": (
        "the quick brown fox jumps over the lazy dog and the people of the "
        "city went to the market where they would buy bread and talk about "
        "the weather because it was the thing that they all shared together"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso y la gente de "
        "la ciudad fue al mercado donde compraban pan y hablaban del tiempo "
        "porque era la cosa que todos compartian juntos cada manana"
    ),
    "de": (
        "der schnelle braune fuchs springt ueber den faulen hund und die "
        "leute der stadt gingen zum markt wo sie brot kauften und ueber das "
        "wetter sprachen weil es das war was sie alle miteinander teilten"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et les "
        "gens de la ville allaient au marche ou ils achetaient du pain et "
        "parlaient du temps parce que cetait la chose quils partageaient"
    ),
}

_NGRAM_DIM = 4096


def _trigram_hashes(text: str):
    import numpy as np

    s = " " + text.lower() + " "
    if len(s) < 3:
        return np.zeros(0, dtype=np.int64)
    b = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8).astype(np.int64)
    tri = b[:-2] * 31 * 31 + b[1:-1] * 31 + b[2:]
    return tri % _NGRAM_DIM


def _lang_profiles():
    import numpy as np

    profiles = {}
    for lang, text in _LANG_SEED_TEXT.items():
        v = np.bincount(_trigram_hashes(text), minlength=_NGRAM_DIM).astype(np.float64)
        v = np.log1p(v)
        profiles[lang] = v / (np.linalg.norm(v) or 1.0)
    return profiles


def make_lang_id_ngram_udf():
    """Arrow-batched char-trigram language IDer: cosine of the document's
    hashed-trigram frequency vector against each committed profile; argmax
    with deterministic language-order tie-break, 'und' when no trigrams."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T

    profiles = _lang_profiles()
    langs = list(profiles)

    @pandas_udf(T.StringType())
    def lang_udf(texts: pd.Series) -> pd.Series:
        import numpy as np

        P = np.stack([profiles[lang] for lang in langs])  # (L, D)

        def one(t):
            if t is None:
                return None
            h = _trigram_hashes(t)
            if len(h) == 0:
                return "und"
            v = np.bincount(h, minlength=_NGRAM_DIM).astype(np.float64)
            v = np.log1p(v)
            n = np.linalg.norm(v)
            if n == 0:
                return "und"
            return langs[int(np.argmax(P @ (v / n)))]

        return texts.map(one)

    return lang_udf


def lang_id_ngram(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col), make_lang_id_ngram_udf()(F.col(text_col)).alias("lang_pred")
    )
