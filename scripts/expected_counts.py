"""Closed-form expected outputs for a REPLICATED corpus, from DuckDB alone.

The stress / scaling / bench runs tile documents.parquet K times
(`synth_raw_files(..., replicate=K)` — contiguous doc_id blocks, same
text/source per base row). Every pipeline output therefore still has a
closed-form oracle: this script builds the tiled `documents` view with the
SAME doc_id remapping and evaluates the driver-contract oracle SQL on it,
WITHOUT running Spark — an independent engine states what the pipeline must
produce at any scale (this is how the 1.28M-doc stress edge count 6,352,138
was pinned; round 1's 6,351,857 was caught as 281 short by exactly this
evaluation).

    python scripts/expected_counts.py [sf_dir] [replicate]

Prints one JSON line: expected pages / canonical edges (total + per pred) /
page nodes / alias pairs.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from confluence2md_spark.sources.corpus import canon_id_sql  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW base AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    n0 = con.execute("SELECT count(*) FROM base").fetchone()[0]
    # identical remap to synth_raw_files: doc_id + rep*n0, other cols kept
    con.execute(
        f"""CREATE VIEW documents AS
        SELECT b.doc_id + r.rep * {n0} AS doc_id, b.text, b.lang, b.source, b.n_chars
        FROM base b CROSS JOIN (SELECT unnest(range({replicate})) AS rep) r"""
    )
    oracles = entry.oracle_sql()
    edges = con.execute(
        f"SELECT count(*), sum(n_sources) FROM ({oracles['kg_edges_canonical']})"
    ).fetchone()
    # canonical edge count across ALL predicates mirrors the pipeline's edge
    # table: links_to (canon dedup) + contains_heading + authored_by +
    # has_attachment, each closed-form per doc_id residue class
    # canonical count for a raw-triple oracle: rewrite the subject through
    # the canon map (subj = 'page:<id>' by construction) and dedup — exactly
    # the pipeline's canonicalize groupBy
    sid = "CAST(substr(subj, 6) AS BIGINT)"

    def canon_count(key: str) -> int:
        return con.execute(
            f"""SELECT count(*) FROM (
                  SELECT DISTINCT
                    'page:' || CAST({canon_id_sql(sid)} AS STRING) AS s, obj
                  FROM ({oracles[key]})
                )"""
        ).fetchone()[0]

    per_pred = [
        ("links_to", edges[0]),
        ("contains_heading", canon_count("kg_contains_heading")),
        ("authored_by", canon_count("kg_authored_by")),
        ("has_attachment", canon_count("kg_has_attachment")),
    ]
    nodes = con.execute(
        f"SELECT count(*) FROM ({oracles['kg_nodes_pages']})"
    ).fetchone()[0]
    pairs = con.execute(
        f"SELECT count(*) FROM ({oracles['kg_canon_map']}) WHERE canon_id != doc_id"
    ).fetchone()[0]
    pages = con.execute(
        "SELECT count(*) FROM documents WHERE doc_id % 11 != 3"
    ).fetchone()[0]
    pp = {k: int(v) for k, v in per_pred}
    out = {
        "sf": sf_dir,
        "replicate": replicate,
        "docs": int(n0 * replicate),
        "expected_pages_rows": int(pages),
        "expected_alias_pairs": int(pairs),
        "expected_page_nodes": int(nodes),
        "expected_edges_per_pred": pp,
        "expected_edges_total": int(sum(pp.values())),
        "expected_links_to_sources": int(edges[1]),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
