"""Product-quantization ANN semantics at sf0.001 (full cross-engine
equality is covered by tools/check_oracle.py `ann_pq_adc_topk`; these
pin the algorithm against an independent pure-Python recomputation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from file_standardization_etl_spark.operators import pq

SF = "/root/testdata/sf0.001"
M, DIMS, DSUB = 4, 64, 16
INIT = list(range(200, 208))
QIDS = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _quant(vec):
    import math

    return [int(math.floor(v * 100 + 0.5)) for v in vec]


def _python_reference(rows, iters=2):
    """Independent plain-Python PQ: train (Lloyd's, floor-div centroid
    update, min-dist/min-code tie-break), encode, ADC — mirrors the
    documented semantics, not the Spark code."""
    qv = {r["vec_id"]: _quant(r["embedding"]) for r in rows}
    subs = {
        (vid, j): v[j * DSUB : (j + 1) * DSUB] for vid, v in qv.items() for j in range(M)
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    cents = {(j, cid): subs[(cid, j)] for cid in INIT for j in range(M)}
    for _ in range(iters):
        members: dict = {}
        for (vid, j), sv in subs.items():
            best = min(
                (d2(sv, cq), cid) for (sj, cid), cq in cents.items() if sj == j
            )
            members.setdefault((j, best[1]), []).append(sv)
        cents = {
            key: [sum(col) // len(svs) for col in zip(*svs)]
            for key, svs in members.items()
        }
    codes = {}
    for vid in qv:
        if vid in QIDS:
            continue
        codes[vid] = [
            min((d2(subs[(vid, j)], cq), cid) for (sj, cid), cq in cents.items() if sj == j)[1]
            for j in range(M)
        ]
    topk = {}
    for q in QIDS:
        dt = {
            (j, cid): d2(subs[(q, j)], cq) for (j, cid), cq in cents.items()
        }
        scored = sorted(
            (sum(dt[(j, c)] for j, c in enumerate(cs)), vid) for vid, cs in codes.items()
        )
        topk[q] = [(rank + 1, vid, d) for rank, (d, vid) in enumerate(scored[:10])]
    return topk


def test_pq_adc_matches_python_reference(spark, emb):
    rows = [r.asDict() for r in emb.select("vec_id", "embedding").collect()]
    expected = _python_reference(rows)
    got = pq.pq_adc_topk(emb, query_ids=QIDS, init_ids=INIT, k=10).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["adc_dist"])
        )
    for q in QIDS:
        assert sorted(by_q[q]) == expected[q]


def test_pq_codes_complete_and_from_trained_codebooks(spark, emb):
    subs = pq.pq_subvectors(emb, m=M, dims=DIMS)
    cents = pq.pq_train(emb, INIT, m=M, dims=DIMS, iters=2)
    codes = pq.pq_codes(subs, cents).collect()
    n_vec = emb.count()
    assert len(codes) == n_vec
    valid = {
        (r["sub_id"], r["code_id"]) for r in cents.select("sub_id", "code_id").collect()
    }
    for r in codes:
        assert len(r["codes"]) == M
        for j, c in enumerate(r["codes"]):
            assert (j, c) in valid


def test_semantic_dedup_matches_within_cluster_bruteforce(spark, emb):
    """Given the operator's own cluster assignment, the dropped set must
    equal a plain-Python within-cluster cosine-threshold sweep — pins the
    pair search and keeper rule independently of Spark expressions."""
    from file_standardization_etl_spark.operators import similarity

    init = list(range(100, 108))
    out = {
        (r["dup_vec"], r["cluster_id"], r["keeper"], r["n_near"])
        for r in similarity.semantic_dup_groups(emb, init_ids=init, iters=3).collect()
    }
    # reconstruct the assignment exactly as the operator defines it
    rows = [r.asDict() for r in emb.select("vec_id", "embedding").collect()]
    import math

    qv = {r["vec_id"]: [int(math.floor(v * 100 + 0.5)) for v in r["embedding"]] for r in rows}
    cents = {
        r["cent_id"]: list(r["centroid"])
        for r in similarity.kmeans_integer(emb, init_ids=init, iters=3).collect()
    }

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    asg = {}
    for vid, v in qv.items():
        n2 = dot(v, v)
        asg[vid] = min(
            (n2 - 2 * dot(v, c) + dot(c, c), cid) for cid, c in cents.items()
        )[1]
    by_cluster: dict = {}
    for vid, cid in asg.items():
        by_cluster.setdefault(cid, []).append(vid)
    expected: dict = {}
    t2e4 = int(round(0.35 * 0.35 * 10_000))
    for cid, vids in by_cluster.items():
        for i, a in enumerate(sorted(vids)):
            for b in sorted(vids)[i + 1 :]:
                d = dot(qv[a], qv[b])
                if d > 0 and d * d * 10_000 >= t2e4 * dot(qv[a], qv[a]) * dot(qv[b], qv[b]):
                    ent = expected.setdefault(b, [cid, b, 0])
                    ent[2] += 1
                    ent[1] = min(ent[1], a)
    exp = {(b, cid, keeper, n) for b, (cid, keeper, n) in expected.items()}
    assert out == exp


def test_curation_funnel_matches_python_pipeline(spark):
    """Recompute all six cumulative stages in plain Python from the raw
    documents — every rule reimplemented from its documented definition,
    not from the Spark expressions."""
    import hashlib

    from file_standardization_etl_spark.operators import curation

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = [r.asDict() for r in docs.select("doc_id", "text").collect()]

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    def bucket(doc_id, salt="split-v1"):
        return int(md5(f"{salt}:{doc_id}")[:4], 16) % 100

    stop = {"the", "a", "of", "and", "to"}
    markers = {"the", "a", "and"}
    grams3 = lambda w: [md5(" ".join(w[i : i + 3])) for i in range(len(w) - 2)]

    flags = {}
    by_md5: dict = {}
    train_grams: dict = {}
    eval_grams: set = set()
    for r in rows:
        d, t = r["doc_id"], r["text"]
        w = t.split(" ")
        f_lang = any(x in markers for x in w)
        n, nd, ns = len(w), len(set(w)), sum(1 for x in w if x in stop)
        f_quality = n >= 5 and ns >= 1 and nd * 1000 >= 300 * n
        g = grams3(w) if len(w) >= 3 else []
        f_rep = True
        if g:
            occ: dict = {}
            for x in g:
                occ[x] = occ.get(x, 0) + 1
            total, dist = len(g), len(occ)
            f_rep = (total - dist) * 1000 // total <= 200
        b = bucket(d)
        flags[d] = [f_lang, f_quality, f_rep, None, b < 98, None]
        by_md5.setdefault(md5(t), []).append(d)
        if b < 98:
            train_grams[d] = set(g)
        else:
            eval_grams |= set(g)
    for h, ds in by_md5.items():
        keep = min(ds)
        for d in ds:
            flags[d][3] = d == keep
    for d in flags:
        flags[d][5] = d not in train_grams or not (train_grams[d] & eval_grams)

    expected = [len(rows)]
    for i in range(6):
        expected.append(sum(1 for f in flags.values() if all(f[: i + 1])))

    got = {
        r["stage_id"]: r["docs"]
        for r in curation.curation_funnel(docs).collect()
    }
    assert [got[i] for i in range(7)] == expected
    assert all(got[i] >= got[i + 1] for i in range(6))


def test_pq_compression_shape(spark, emb):
    """The scale claim: the ADC scan reads m int codes per vector, not
    d floats — assert the encoded representation is really m-wide and
    the scored plan broadcasts the LUT (no shuffle of the corpus)."""
    out = pq.pq_adc_topk(emb, query_ids=QIDS, init_ids=INIT, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
