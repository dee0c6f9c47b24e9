"""Paired probe: pre-r12 minhash_signature (12 duplicated HOF copies,
md5 inlined twice) vs the single-eval fold form now in dedup.py.

Times the signature materialization on the sf0.1 documents fixture and
byte-compares the two signature columns on every row. Run on an
otherwise idle host.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from meteor_spark.session import get_spark
from meteor_spark.operators.dedup import minhash_signature, shingle_frame

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_HASHES = 12


def sig_old(sh, num_hashes=N_HASHES):
    """The pre-r12 form, inlined for the paired probe."""
    hashes = F.transform(
        sh,
        lambda s: F.struct(
            F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(F.md5(s), 9, 8), 16, 10).cast("long").alias("h2"),
        ),
    )

    def km_family(i):
        return lambda p: p.getField("h1") + F.lit(i) * p.getField("h2")

    return F.array(
        *[F.array_min(F.transform(hashes, km_family(i))) for i in range(num_hashes)]
    )


def main():
    spark = get_spark("probe_minhash_sig")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    par = spark.sparkContext.defaultParallelism
    docs = docs.repartition(par)
    sh_df = shingle_frame(docs, "text", "doc_id", 3).persist()
    sh_df.count()

    def timeit(label, frame, n=3):
        runs = []
        for _ in range(n):
            t0 = time.time()
            frame.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        print(label, runs, flush=True)
        return runs

    old = sh_df.select("doc_id", sig_old(F.col("sh"), N_HASHES).alias("sig"))
    new = sh_df.select("doc_id", minhash_signature(F.col("sh"), N_HASHES).alias("sig"))

    # bit-identity on every row first
    diff = old.exceptAll(new).count() + new.exceptAll(old).count()
    print("diff rows:", diff, flush=True)
    assert diff == 0, "signature mismatch"

    timeit("old ", old)
    timeit("fold", new)
    timeit("old ", old)
    timeit("fold", new)
    spark.stop()


if __name__ == "__main__":
    main()
