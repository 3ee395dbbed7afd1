"""Registry entries for the graph/clustering stage of the dedup
pipeline (operators/graph.py): transitive near-dup clusters over the
MinHash-LSH pair graph, and the canonical keeper per cluster.

Oracle-checkability for an ITERATIVE distributed algorithm: both engines
compute the same mathematical object — the minimum node id reachable in
the undirected pair graph — Spark by hash-min propagation to fixpoint,
DuckDB by a recursive CTE. The shingle/signature CTEs are imported from
queries_ext so the candidate-pair definition can never drift from the
`dedup_minhash_lsh` oracle.
"""

from __future__ import annotations

from ..operators import dedup_text, graph
from .queries import load
from .queries_ext import _SQL_SHINGLES

_SQL_CC_CTES = f"""
WITH RECURSIVE {_SQL_SHINGLES},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM sigc a JOIN sigc b2 ON a.band = b2.band AND a.sig = b2.sig AND a.doc_id < b2.doc_id
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM cand
  UNION
  SELECT doc_b AS u, doc_a AS v FROM cand
),
reach(node, lab) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, r.lab FROM reach r JOIN edges e ON e.v = r.node
),
comp AS (SELECT node AS doc_id, min(lab) AS component FROM reach GROUP BY node)
"""


def q_dedup_cluster_cc(spark, sf_dir):
    """Transitive near-dup clusters: hash-min connected components
    (operators/graph.py:connected_components) over the LSH candidate
    pairs. A~B and B~C land in one cluster even when A~C was never a
    candidate pair — the property pairwise output can't give you."""
    pairs = dedup_text.minhash_lsh_candidates(load(spark, sf_dir, "documents"))
    return graph.connected_components(pairs)


SQL_DEDUP_CLUSTER_CC = f"""
{_SQL_CC_CTES}
SELECT doc_id, component FROM comp
"""


def q_dedup_cluster_keepers(spark, sf_dir):
    """Canonical document per near-dup cluster: longest text wins, ties
    to the smallest doc_id (operators/graph.py:cluster_keepers)."""
    docs = load(spark, sf_dir, "documents")
    comps = graph.connected_components(dedup_text.minhash_lsh_candidates(docs))
    return graph.cluster_keepers(docs, comps)


SQL_DEDUP_CLUSTER_KEEPERS = f"""
{_SQL_CC_CTES},
j AS (
  SELECT d.doc_id, length(d.text) AS len, c.component
  FROM documents d JOIN comp c ON d.doc_id = c.doc_id
),
s AS (SELECT component, count(*) AS n_docs, max(len) AS best_len FROM j GROUP BY component)
SELECT j.component, s.n_docs, min(j.doc_id) AS keeper_doc
FROM j JOIN s ON j.component = s.component AND j.len = s.best_len
GROUP BY j.component, s.n_docs
"""


GRAPH_QUERIES: dict[str, tuple] = {
    "dedup_cluster_cc": (q_dedup_cluster_cc, SQL_DEDUP_CLUSTER_CC),
    "dedup_cluster_keepers": (q_dedup_cluster_keepers, SQL_DEDUP_CLUSTER_KEEPERS),
}
