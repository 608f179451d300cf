"""get_spark contract: true first-caller-wins — a later call must never
mutate the live session's runtime confs, from the main thread OR a worker
thread (getActiveSession is thread-local; the default-session fallback
covers threads)."""

import threading

from xoverrr_spark.session import get_spark


def test_get_spark_returns_live_session_untouched(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    s2 = get_spark("clobber_attempt", cores=2, shuffle_partitions=1,
                   extra_conf={"spark.sql.shuffle.partitions": "1"})
    assert s2 is spark
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_get_spark_from_worker_thread_no_clobber(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    got = {}

    def worker():
        got["s"] = get_spark("thread_caller", shuffle_partitions=1)

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert got["s"] is spark
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
