"""Micro-benchmark per-action overhead in the test session config."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from glue_table_cache_spark.session import build_session

spark = build_session(app_name="micro", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
df.collect()  # warm

t0 = time.time()
for i in range(5):
    t1 = time.time()
    d = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    print(f"createDataFrame: {time.time()-t1:.3f}s", flush=True)
    t1 = time.time()
    d.collect()
    print(f"collect:         {time.time()-t1:.3f}s", flush=True)
    t1 = time.time()
    d.coalesce(1).write.mode("overwrite").parquet(f"/tmp/micro_{i}.parquet")
    print(f"write parquet:   {time.time()-t1:.3f}s", flush=True)
print(f"total: {time.time()-t0:.3f}s")
spark.stop()
