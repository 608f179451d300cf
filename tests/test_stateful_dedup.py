"""Cross-batch streaming dedup via applyInPandasWithState: duplicates in
batch 2 of fingerprints already seen in batch 1 must NOT be re-emitted."""

from xoverrr_spark.streaming.stateful_dedup import stream_dedup


def _write(spark, rows, path):
    spark.createDataFrame(rows, "image_id string, caption string").coalesce(1) \
        .write.mode("append").parquet(path)


def _drain(spark, inp, out, ckpt):
    src = spark.readStream.schema("image_id string, caption string").parquet(inp)
    q = (
        stream_dedup(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_first_seen_wins_across_batches(spark, tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")

    _write(spark, [("a1", "the dog"), ("a2", "the dog"), ("b1", "the cat")], inp)
    _drain(spark, inp, out, ckpt)
    got1 = spark.read.parquet(out).toPandas()
    # within-batch dedup: one survivor per fingerprint, smallest id
    assert sorted(got1["image_id"]) == ["a1", "b1"]

    # batch 2: 'the dog' again (seen), plus a new caption
    _write(spark, [("c9", "the dog"), ("d1", "the bird")], inp)
    _drain(spark, inp, out, ckpt)
    got2 = spark.read.parquet(out).toPandas()
    assert sorted(got2["image_id"]) == ["a1", "b1", "d1"]  # c9 suppressed by state


# --- TTL state machine: unit-tested against a stub GroupState -----------
# (a live ProcessingTimeTimeout query never self-terminates under test
# triggers — pending timeouts keep it alive — so the TTL branches are
# pinned directly; the NoTimeout streaming test above already exercises
# the same _make_first_seen factory through applyInPandasWithState)

import pandas as pd

from xoverrr_spark.streaming.stateful_dedup import _make_first_seen


class _StubState:
    def __init__(self, exists=False, value=None, timed_out=False):
        self._exists, self._value, self.hasTimedOut = exists, value, timed_out
        self.removed = False
        self.updated = None
        self.timeout_ms = None

    @property
    def exists(self):
        return self._exists

    @property
    def get(self):
        return self._value

    def update(self, v):
        self.updated = v

    def remove(self):
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


_PDF = pd.DataFrame({"image_id": ["z2", "z1"], "caption": ["c", "c"],
                     "text_fp": ["f", "f"]})


def test_ttl_timed_out_key_is_evicted():
    fn = _make_first_seen(60_000)
    st = _StubState(exists=True, value=(True,), timed_out=True)
    out = list(fn(("f",), iter([_PDF]), st))
    assert out == [] and st.removed and st.updated is None


def test_ttl_fresh_key_emits_and_arms_timeout():
    fn = _make_first_seen(60_000)
    st = _StubState()
    out = list(fn(("f",), iter([_PDF]), st))
    assert len(out) == 1 and list(out[0]["image_id"]) == ["z1"]  # smallest id
    assert st.updated == (True,) and st.timeout_ms == 60_000


def test_ttl_seen_key_suppressed_and_rearmed():
    fn = _make_first_seen(60_000)
    st = _StubState(exists=True, value=(True,))
    out = list(fn(("f",), iter([_PDF]), st))
    assert out == []
    assert st.updated == (True,) and st.timeout_ms == 60_000


def test_no_ttl_never_touches_timeout():
    fn = _make_first_seen(None)
    st = _StubState()
    list(fn(("f",), iter([_PDF]), st))
    assert st.timeout_ms is None and st.updated == (True,)
