"""North-rule resumability under a REAL mid-build kill: a separate
process building the index is SIGKILLed mid-flight; a resumed build
over the same input must produce an index identical to a single-shot
build (and CheckIndex-clean), regardless of where the kill landed
(staged-but-uncommitted sink files, partial meta, or nothing yet).
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pytest

from lucene_solr_spark.index.checkindex import check_index
from lucene_solr_spark.index.segments import build_segment_index

N_DOCS = 30_000
SEG = 1 << 12

_CHILD = r"""
import sys
from lucene_solr_spark.session import get_spark
from lucene_solr_spark.sources.webtext import synth_pages
from lucene_solr_spark.index.segments import build_segment_index
spark = get_spark(app_name="kill-victim", cores=4, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(sys.argv[1])
build_segment_index(pages, sys.argv[2], seg_size=%d, store_positions=False)
print("COMPLETED", flush=True)
""" % SEG


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    from lucene_solr_spark.sources.webtext import synth_pages

    p = str(tmp_path_factory.mktemp("killsrc") / "pages")
    synth_pages(spark, N_DOCS, seed=42).write.mode("overwrite").parquet(p)
    return p


def test_kill_mid_build_then_resume(spark, corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("kill")
    victim_path = str(base / "victim")
    fresh_path = str(base / "fresh")

    # launch the victim build and SIGKILL it mid-flight
    env = dict(os.environ)
    env["SPARK_DRIVER_MEMORY"] = "4g"
    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD, corpus, victim_path],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env,
        cwd="/root/repo")
    # let it get past session startup and into the build jobs (the
    # kill lands somewhere in analyze/shuffle/sink territory)
    time.sleep(22)
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait(30)
        killed = True
    else:
        killed = b"COMPLETED" in (proc.stdout.read() or b"")
        killed = not killed  # finished too fast: weaker but still valid

    # resume (or no-op if it somehow completed) in this process
    pages = spark.read.parquet(corpus)
    resumed = build_segment_index(pages, victim_path, seg_size=SEG,
                                  resume=True, store_positions=False)
    assert check_index(resumed)["clean"]

    # must equal a single-shot build bit-for-bit at the table level
    fresh = build_segment_index(pages, fresh_path, seg_size=SEG,
                                store_positions=False)
    for sub in ("postings", "docs"):
        a = spark.read.parquet(f"{victim_path}/{sub}")
        b = spark.read.parquet(f"{fresh_path}/{sub}")
        assert a.count() == b.count(), sub
        assert a.exceptAll(b).count() == 0, sub
        assert b.exceptAll(a).count() == 0, sub
    am = resumed.meta.select("seg_id", "doc_base", "doc_count", "sum_doclen")
    bm = fresh.meta.select("seg_id", "doc_base", "doc_count", "sum_doclen")
    assert am.exceptAll(bm).count() == 0
    # record whether the kill actually interrupted the build (the test
    # is meaningful either way, but mid-flight is the interesting case)
    print(f"killed_mid_build={killed}")
