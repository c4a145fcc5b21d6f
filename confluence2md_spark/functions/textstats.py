"""Text analysis for training-data curation (SURVEY.md driver mandate):
token counting, quality scoring, document fingerprinting, language-ID.

Every SQL-expressible metric is defined ONCE per engine dialect with
identical arithmetic, so the DuckDB oracle verifies the Spark plan
value-for-value (incl. the rolling fingerprint, which is bit-exact:
h := (h*31 + ascii(c)) mod (2^31-1) folded left over the characters).

Language-ID is the one pandas-UDF member (per-language stopword/char
profiles need a lookup table) — Arrow-batched, numpy-vectorized per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = (
    "the a an and or of to in is are was for on with as at by it this that".split()
)

# ---------------------------------------------------------------- tokens ---

def tokens_col(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


TOKENS_SQL_DUCK = "regexp_split_to_array(trim(lower({t})), '\\s+')"


# Ratio metrics are emitted as floor(x * 1e6) BIGINT "micros": floor acts on
# the binary double (identical in both engines for identical op sequences),
# whereas round() semantics differ between Spark (BigDecimal half-up on the
# shortest decimal repr) and DuckDB (binary-scaled) exactly at .5 boundaries.
def _micros(col: Column) -> Column:
    return F.floor(col * 1_000_000).cast("bigint")


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, avg_token_len_micros) — J15/J18."""
    toks = tokens_col(F.col(text_col))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        _micros(
            F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
            / F.size(toks)
        ).alias("avg_token_len_micros"),
    )


def token_stats_sql_duck(docs: str = "documents") -> str:
    toks = TOKENS_SQL_DUCK.format(t="text")
    return f"""SELECT doc_id,
  len({toks}) AS n_tokens,
  len(list_distinct({toks})) AS n_distinct_tokens,
  CAST(floor(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform({toks}, t -> CAST(length(t) AS BIGINT))), (a,b) -> a+b)
        / CAST(len({toks}) AS DOUBLE) * 1000000) AS BIGINT) AS avg_token_len_micros
FROM {docs}"""


# --------------------------------------------------------------- quality ---

def quality_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars_obs, stopword_ratio_micros, space_ratio_micros,
    quality_score_micros).

    quality_score: deterministic [0,1] blend — high stopword presence and
    high space (word-separation) density signal prose; formula mirrored in
    the oracle; all ratios reported as floor-micros (see _micros).
    """
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
    sw_ratio = sw / n_tok
    space_ratio = (
        F.length(text_col) - F.length(F.regexp_replace(text_col, " ", ""))
    ) / F.length(text_col)
    score = F.least(sw_ratio * F.lit(4.0), F.lit(1.0)) * 0.5 + space_ratio * 0.5
    return docs.select(
        "doc_id",
        F.length(text_col).alias("n_chars_obs"),
        _micros(sw_ratio).alias("stopword_ratio_micros"),
        _micros(space_ratio).alias("space_ratio_micros"),
        _micros(score).alias("quality_score_micros"),
    )


def quality_stats_sql_duck(docs: str = "documents") -> str:
    toks = TOKENS_SQL_DUCK.format(t="text")
    sw_list = ",".join(f"'{w}'" for w in STOPWORDS_EN)
    sw_ratio = f"(len(list_filter({toks}, t -> t IN ({sw_list}))) / CAST(len({toks}) AS DOUBLE))"
    space_ratio = "((length(text) - length(replace(text, ' ', ''))) / CAST(length(text) AS DOUBLE))"
    return f"""SELECT doc_id,
  length(text) AS n_chars_obs,
  CAST(floor({sw_ratio} * 1000000) AS BIGINT) AS stopword_ratio_micros,
  CAST(floor({space_ratio} * 1000000) AS BIGINT) AS space_ratio_micros,
  CAST(floor((least({sw_ratio} * 4.0, 1.0) * 0.5 + {space_ratio} * 0.5) * 1000000) AS BIGINT) AS quality_score_micros
FROM {docs}"""


# ----------------------------------------------------------- fingerprint ---

FINGERPRINT_SPARK = "aggregate(split({t}, ''), CAST(0 AS BIGINT), (h, c) -> (h*31 + ascii(c)) % 2147483647)"
FINGERPRINT_DUCK = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({t}, ''), c -> CAST(ascii(c) AS BIGINT))), "
    "(h, c) -> (h*31 + c) % 2147483647)"
)


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp) rolling polynomial hash — bit-exact vs the oracle."""
    return docs.select(
        "doc_id", F.expr(FINGERPRINT_SPARK.format(t=text_col)).alias("fp")
    )


def fingerprint_sql_duck(docs: str = "documents") -> str:
    return f"SELECT doc_id, {FINGERPRINT_DUCK.format(t='text')} AS fp FROM {docs}"


# ---------------------------------------------------------------- langid ---

# Tiny per-language marker profiles (substring heuristics; public-knowledge
# stopword lists). Scored per token; argmax wins, 'en' on ties.
_LANG_MARKERS: dict[str, set] = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "que"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "que", "en"},
    "zh": set(),  # CJK detected by codepoint range below
}


def _langid_series(texts: pd.Series) -> pd.Series:
    out = []
    for t in texts.fillna(""):
        has_cjk = any("一" <= ch <= "鿿" for ch in t[:2000])
        if has_cjk:
            out.append("zh")
            continue
        toks = t.lower().split()
        best, best_score = "en", -1
        for lang, markers in _LANG_MARKERS.items():
            if not markers:
                continue
            score = sum(1 for tok in toks if tok in markers)
            if score > best_score:
                best, best_score = lang, score
        out.append(best)
    return pd.Series(out)


def predict_language(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang, predicted_lang) via an Arrow-batched pandas UDF."""
    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "predicted_lang": _langid_series(pdf[text_col]),
                }
            )

    return docs.select("doc_id", "lang", text_col).mapInPandas(
        _batches, schema="doc_id long, lang string, predicted_lang string"
    )
