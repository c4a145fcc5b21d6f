"""Deterministic synthetic `raw_files` corpus (the BASELINE.json `input_hint`
table shape) built from the driver's `documents` parquet.

The whole construction is ONE shared SQL expression evaluated by BOTH engines:

* Spark  — `synth_raw_files(spark, sf_dir)` materializes the pipeline input
  (columns exactly `repo, path, commit, lang, content` plus an internal
  `doc_id`), JVM-side whole-stage-codegen string concat — no Python per row.
* DuckDB — `duckdb_raw_files_cte()` embeds the same expression in oracle SQL,
  so the driver's correctness gate verifies the *entire* Spark pipeline
  (MIME synth -> detect -> parse -> convert -> extract) against closed-form
  expectations derived from the same formulas.

Corpus structure (all formulas over `doc_id`, N = count(documents)):

  row class       condition            content
  --------------- -------------------- --------------------------------------
  code file       doc_id % 11 == 3     documents.text verbatim (lang kept)
  not_multipart   doc_id % 97 == 95    Confluence headers, text/plain body
  no_html_part    doc_id % 97 == 96    multipart with only an image part
  page            otherwise            full Confluence MIME export (below)

  page features:
    title         'Page T' where T = doc_id - 7 if doc_id % 10 == 7 else
                  doc_id  (dup-title pairs (10k, 10k+7) drive entity linking /
                  connected components with a closed-form expected answer)
    qp encoding   doc_id % 7 == 0   -> quoted-printable part with an `=3D`
                  escape (decodes to '='); others 7bit
    links_to      two page links: L1 = (doc_id*7+1) % N, L2 = (doc_id*3+2) % N
                  (targets may be non-page rows -> unresolved-link handling)
    author        user{doc_id % 25} via confluence-userlink span
    attachment    doc_id % 4 == 0  -> base64 image/png MIME part
                  doc_id % 6 == 0  -> /download/attachments/ URL in the body
    headings      h1 'Page T', h2 'Details', h3 'Notes' iff doc_id % 3 == 0
    skew          60% of rows land in 'repo-hot' (doc_id % 5 < 3) so salted
                  repartitioning (SURVEY.md 2.K K1) is exercised, not dead code

MIME shape mirrors the reference fixtures (/root/reference/converter/
mime_test.go:75-138: folded headers tolerated, QP soft escapes, base64 image
part that the reference skips, mime_test.go:266-301).
"""

from __future__ import annotations

BOUNDARY = "----=_Part_KG"

# 1x1 transparent PNG, base64 (deterministic attachment payload).
_PNG_B64 = (
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
    "AAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)

_HEADERS = (
    "Date: Wed, 01 Jan 2025 00:00:00 +0000\n"
    "MIME-Version: 1.0\n"
    "Subject: Exported From Confluence\n"
)

# ---- row-class predicates (shared by Spark exprs and DuckDB oracles) ------
IS_CODE_SQL = "(doc_id % 11 = 3)"
IS_PAGE_SQL = "(doc_id % 11 <> 3 AND doc_id % 97 <> 95 AND doc_id % 97 <> 96)"
# Title id: dup pages (10k+7) share page 10k's title.
TITLE_ID_SQL = "(CASE WHEN doc_id % 10 = 7 THEN doc_id - 7 ELSE doc_id END)"


def is_page_sql(col: str) -> str:
    """IS_PAGE predicate over an arbitrary bigint column expression."""
    return f"(({col}) % 11 <> 3 AND ({col}) % 97 <> 95 AND ({col}) % 97 <> 96)"


def canon_id_sql(col: str) -> str:
    """Canonical page id for page id `col`: dup pages (10k+7) canonicalize to
    10k iff BOTH ends exist as pages (the alias edge requires two nodes)."""
    return (
        f"(CASE WHEN ({col}) % 10 = 7 AND {is_page_sql(col)} "
        f"AND {is_page_sql(f'({col}) - 7')} THEN ({col}) - 7 ELSE ({col}) END)"
    )


CANON_ID_SQL = canon_id_sql("doc_id")


def _q(s: str) -> str:
    """SQL string literal (single-quote escape; real newlines are legal in
    both Spark SQL and DuckDB string literals)."""
    return "'" + s.replace("'", "''") + "'"


def _cat(*pieces: str) -> str:
    return "(" + " || ".join(pieces) + ")"


_ID = "CAST(doc_id AS STRING)"
_TID = f"CAST({TITLE_ID_SQL} AS STRING)"
_U = "CAST(doc_id % 25 AS STRING)"


def _link_expr(n_sql: str, mult: int, add: int) -> str:
    return f"CAST((doc_id * {mult} + {add}) % {n_sql} AS STRING)"


def _html_expr(n_sql: str) -> str:
    l1 = _link_expr(n_sql, 7, 1)
    l2 = _link_expr(n_sql, 3, 2)
    return _cat(
        _q("<html><head><title>Page "), _TID,
        _q("</title></head><body>\n<h1>Page "), _TID, _q("</h1>\n<p>"),
        "text", _q("</p>\n"),
        f"CASE WHEN doc_id % 7 = 0 THEN {_q('<p>QP test: a =3D b</p>' + chr(10))} ELSE '' END",
        _q('<p>See <a href="/wiki/spaces/'), "source", _q("/pages/"), l1,
        _q("/Page-"), l1, _q('">Page '), l1,
        _q('</a> and <a href="/wiki/spaces/'), "source", _q("/pages/"), l2,
        _q("/Page-"), l2, _q('">Page '), l2, _q("</a>.</p>\n"),
        _q('<h2>Details</h2>\n<p>By <span class="confluence-userlink user-mention" data-username="user'),
        _U, _q('"><span class="user-name">User '), _U, _q("</span></span></p>\n"),
        "CASE WHEN doc_id % 6 = 0 THEN "
        + _cat(
            _q('<p><a href="/download/attachments/'), _ID, _q("/spec-"), _ID,
            _q('.pdf">spec-'), _ID, _q(".pdf</a></p>\n"),
        )
        + " ELSE '' END",
        f"CASE WHEN doc_id % 3 = 0 THEN {_q('<h3>Notes</h3>' + chr(10) + '<p>Additional notes.</p>' + chr(10))} ELSE '' END",
        _q("</body></html>"),
    )


# MIME part scaffolding strings.
_MP_HEAD = _HEADERS + f'Content-Type: multipart/related; boundary="{BOUNDARY}"\n\n--{BOUNDARY}\n'
_HTML_PART_HEAD_7BIT = 'Content-Type: text/html; charset="UTF-8"\nContent-Transfer-Encoding: 7bit\n\n'
_HTML_PART_HEAD_QP = 'Content-Type: text/html; charset="UTF-8"\nContent-Transfer-Encoding: quoted-printable\n\n'
_CLOSE = f"\n--{BOUNDARY}--\n"


def _image_part_expr() -> str:
    return _cat(
        _q(f"\n--{BOUNDARY}\n" 'Content-Type: image/png; name="att-'), _ID,
        _q('.png"\nContent-Disposition: attachment; filename="att-'), _ID,
        _q('.png"\nContent-Transfer-Encoding: base64\n\n' + _PNG_B64),
    )


def content_expr(n_sql: str) -> str:
    """The full `content` column as one SQL expression over
    (doc_id, text, source); `n_sql` is the corpus-size expression."""
    html = _html_expr(n_sql)
    page = _cat(
        _q(_MP_HEAD),
        f"CASE WHEN doc_id % 7 = 0 THEN {_q(_HTML_PART_HEAD_QP)} ELSE {_q(_HTML_PART_HEAD_7BIT)} END",
        html,
        f"CASE WHEN doc_id % 4 = 0 THEN {_image_part_expr()} ELSE '' END",
        _q(_CLOSE),
    )
    not_multipart = _cat(_q(_HEADERS + "Content-Type: text/plain\n\n"), "text", _q("\n"))
    no_html = _cat(_q(_MP_HEAD[: -len(f"--{BOUNDARY}\n")]), _image_part_expr(), _q(_CLOSE))
    return (
        "CASE "
        f"WHEN {IS_CODE_SQL} THEN text "
        f"WHEN doc_id % 97 = 95 THEN {not_multipart} "
        f"WHEN doc_id % 97 = 96 THEN {no_html} "
        f"ELSE {page} END"
    )


def raw_files_select(docs_table: str, n_sql: str, dialect: str = "spark") -> str:
    """SELECT producing the `input_hint` table
    (repo, path, commit, lang, content) + internal doc_id, from `documents`.

    `dialect` only affects identifier quoting (`commit` is a Spark keyword).
    """
    qc = "`commit`" if dialect == "spark" else '"commit"'
    return f"""SELECT
  CASE WHEN doc_id % 5 < 3 THEN 'repo-hot' ELSE 'repo-' || CAST(doc_id % 17 AS STRING) END AS repo,
  CASE WHEN {IS_CODE_SQL} THEN 'src/file-' || CAST(doc_id AS STRING) || '.py'
       ELSE 'docs/page' || CASE WHEN doc_id % 8 = 0 THEN '+' ELSE '-' END || CAST(doc_id AS STRING) || '.doc' END AS path,
  'commit-' || CAST(doc_id % 1000 AS STRING) AS {qc},
  CASE WHEN {IS_CODE_SQL} THEN lang ELSE 'confluence' END AS lang,
  {content_expr(n_sql)} AS content,
  doc_id AS doc_id
FROM {docs_table}"""


# Static Spark-side template; format with the runtime corpus size.
RAW_FILES_SELECT = raw_files_select("documents", "{N}", dialect="spark")


def duckdb_raw_files_cte() -> str:
    """`raw_files AS (...)` CTE body for DuckDB oracle SQL; corpus size is a
    scalar subquery so the same oracle string works at any sf."""
    return raw_files_select(
        "documents", "(SELECT count(*) FROM documents)", dialect="duckdb"
    )


def synth_raw_files(spark, sf_dir: str, replicate: int = 1):
    """Materialize the raw_files DataFrame for `sf_dir` (pure column exprs,
    zero Python-per-row; at cluster scale this is replaced by
    `catalog.load_table('raw_files')` over the real Iceberg corpus).

    `replicate=K` tiles the documents table K times with contiguous new
    doc_ids (doc_id + k*N) — every corpus formula stays consistent, so the
    same pipeline runs at K× volume (used by the scaling benchmark)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    if replicate > 1:
        reps = spark.range(replicate).select(F.col("id").alias("rep"))
        docs = docs.crossJoin(reps).select(
            (F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        n = n * replicate
    # Repartition BEFORE the content expression: the documents parquet is one
    # small file (one input partition, and crossJoin preserves that), so
    # without this every MIME string would be concatenated inside a single
    # task regardless of cluster width.
    docs = docs.repartition(spark.sparkContext.defaultParallelism * 2)
    docs.createOrReplaceTempView("documents")
    # .replace, NOT str.format: the template embeds corpus HTML that may one
    # day contain literal braces (JSON/CSS) — format() would raise KeyError
    # at runtime on content that is perfectly legal input.
    return spark.sql(RAW_FILES_SELECT.replace("{N}", str(n)))
