#!/usr/bin/env python
"""Multi-core AUDIO decode stage throughput (the fleet-sizing number,
round-11's image-stage methodology): N identical payloads through
whisper_spark.operators.multimodal.decode_samples on the local[32]
session, payload frame cached, workers pre-warmed, 3 timed reps.

Usage: python tools/bench_audio_stage.py [n_payloads]
"""
import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    # loading the test modules below executes tests/conftest.py, whose
    # setdefault would pin the session at local[4]; claim full width
    # first
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count()))
    from pyspark.sql import functions as F

    from whisper_spark.operators.multimodal import decode_samples
    from whisper_spark.session import get_spark

    BF = load(os.path.join(REPO, "tools", "bench_flac_rice.py"), "bf")
    BV = load(os.path.join(REPO, "tools", "bench_vorbis_residue.py"),
              "bv")
    BM = load(os.path.join(REPO, "tools", "bench_mp3_l3.py"), "bm")
    flac, flac_smp = BF.build(4, 1024, porder=2, noise=900)
    vorb, vorb_smp = BV.build_large(8, 1)
    # inject the self-consistent L3 tables BEFORE building the decode
    # stage — the Spark closure captures them by value
    from whisper_spark.operators import mp3 as mp3_mod
    tabs = BM.T._l3_test_tables()
    mp3_mod.set_l3_tables(**tabs)
    mp3 = BM.stream(tabs)
    mp3_smp = 8 * 1152

    spark = get_spark(app_name="audio_stage_bench")
    ncores = spark.sparkContext.defaultParallelism
    for label, payload, smp in (("flac fixed+rice 4x1024", flac,
                                 flac_smp),
                                ("vorbis large-design 8 blocks", vorb,
                                 vorb_smp),
                                ("mp3 L3 dense 8-frame", mp3,
                                 mp3_smp)):
        df = (
            spark.range(n, numPartitions=ncores)
            .select(F.col("id").alias("media_id"),
                    F.lit(bytearray(payload)).alias("payload"))
            .persist()
        )
        df.count()
        decode_samples(df).write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            decode_samples(df).write.format("noop") \
                .mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        df.unpersist()
        print(f"{label}: {n / best:,.0f} payloads/s  "
              f"{n * smp / best / 1e6:6.2f} Msmp/s on local[{ncores}]")


if __name__ == "__main__":
    main()
