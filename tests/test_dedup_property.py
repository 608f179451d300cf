"""Property-based checks for the dedup family: the distributed operators
agree with independent sequential twins written from the spec (union-find
for connected components; python set-Jaccard for the candidate verify).
"""

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st

from xoverrr_spark.operators.dedup import candidate_jaccard, cluster_near_dups

_EDGES = st.lists(
    st.tuples(st.integers(min_value=0, max_value=15),
              st.integers(min_value=0, max_value=15))
    .filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=20,
)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=_EDGES)
def test_cluster_labels_match_union_find(spark, edges):
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "doc_a int, doc_b int")
    got = {r["doc_id"]: r["cluster_id"]
           for r in cluster_near_dups(pairs, max_iter=10).collect()}
    assert got == _union_find_components(edges)


_WORDS = ["red", "blue", "fox", "dog", "cat", "run", "sit", "sky"]
_DOC = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10).map(" ".join)


def _py_shingles(text, n=3):
    words = text.lower().split()
    if len(words) < n:
        grams = {" ".join(words)}
    else:
        grams = {" ".join(words[i:i + n]) for i in range(len(words) - n + 1)}
    return {int(hashlib.md5(g.encode()).hexdigest()[:10], 16) for g in grams}


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_DOC, min_size=2, max_size=6))
def test_candidate_jaccard_matches_python_twin(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id int, text string")
    cands_py = [(i, j) for i in range(len(texts)) for j in range(i + 1, len(texts))]
    cands = spark.createDataFrame(cands_py, "doc_a int, doc_b int")
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in candidate_jaccard(docs, "doc_id", "text", cands).collect()}
    for i, j in cands_py:
        a, b = _py_shingles(texts[i]), _py_shingles(texts[j])
        expected = len(a & b) / len(a | b)
        assert abs(got[(i, j)] - expected) < 1e-12, (i, j, texts)
