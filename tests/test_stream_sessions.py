"""Streaming sessionization: state-transition unit tests (stub GroupState —
drain-based tests cannot fire event-time timeouts, they only trigger when
the watermark advances in a later batch) plus an integration drain that
checks gap-closed sessions match the batch sessionizer on in-order data."""

import pandas as pd
import pytest

from xoverrr_spark.streaming.stream_sessions import make_sessionizer, stream_sessions


class _StubState:
    def __init__(self, exists=False, value=None, timed_out=False):
        self._exists, self._value, self.hasTimedOut = exists, value, timed_out
        self.removed = False
        self.updated = None
        self.timeout_ts = None

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

    def setTimeoutTimestamp(self, ms):
        self.timeout_ts = ms


def _pdf(ts):
    return pd.DataFrame({"tsec": ts})


def test_single_batch_gap_splits_sessions():
    fn = make_sessionizer(gap_seconds=100)
    st = _StubState()
    out = list(fn((7,), iter([_pdf([0, 50, 60, 300, 320])]), st))
    closed = pd.concat(out)
    assert closed.to_dict("records") == [
        {"user_id": 7, "session_start": 0, "session_end": 60, "n_events": 3}
    ]
    # the trailing session stays open in state, timeout at end + gap
    assert st.updated == (300, 320, 2)
    assert st.timeout_ts == (320 + 100) * 1000


def test_cross_batch_continuation_extends_open_session():
    fn = make_sessionizer(gap_seconds=100)
    st = _StubState(exists=True, value=(0, 60, 3))
    out = list(fn((7,), iter([_pdf([120, 130])]), st))
    assert out == []                       # within gap: same session grows
    assert st.updated == (0, 130, 5)


def test_cross_batch_gap_closes_previous_session():
    fn = make_sessionizer(gap_seconds=100)
    st = _StubState(exists=True, value=(0, 60, 3))
    out = list(fn((7,), iter([_pdf([500])]), st))
    closed = pd.concat(out).to_dict("records")
    assert closed == [
        {"user_id": 7, "session_start": 0, "session_end": 60, "n_events": 3}
    ]
    assert st.updated == (500, 500, 1)


def test_timeout_flushes_open_session_and_clears_state():
    fn = make_sessionizer(gap_seconds=100)
    st = _StubState(exists=True, value=(10, 90, 4), timed_out=True)
    out = list(fn((9,), iter([]), st))
    assert pd.concat(out).to_dict("records") == [
        {"user_id": 9, "session_start": 10, "session_end": 90, "n_events": 4}
    ]
    assert st.removed and st.updated is None


def test_out_of_order_within_batch_is_sorted():
    fn = make_sessionizer(gap_seconds=100)
    st = _StubState()
    out = list(fn((1,), iter([_pdf([320, 0, 300, 60, 50])]), st))
    assert pd.concat(out).to_dict("records") == [
        {"user_id": 1, "session_start": 0, "session_end": 60, "n_events": 3}
    ]
    assert st.updated == (300, 320, 2)


def test_stream_gap_closed_sessions_match_batch(spark, tmp_path):
    from xoverrr_spark.operators.counts import session_stats

    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", "user_id", "ts")
    )
    ev.coalesce(1).write.mode("append").parquet(inp)

    stream = spark.readStream.schema(ev.schema).parquet(inp)
    q = (
        stream_sessions(stream, gap_seconds=1800, watermark_delay="1 minute")
        .writeStream.format("memory").queryName("sess_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    batch = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in session_stats(
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        ).collect()
    }
    # every stream-emitted CLOSED session is exactly a batch session; open
    # sessions (the last per user) flush only when a later watermark fires
    assert got, "expected at least one gap-closed session in one batch"
    for k, v in got.items():
        assert batch.get(k) == v, (k, v, batch.get(k))
    assert len(got) < len(batch)  # open sessions not flushed by the drain
