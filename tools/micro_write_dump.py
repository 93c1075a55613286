"""Dump JVM stacks mid-write to find the 6s stall."""
import subprocess
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from glue_table_cache_spark.session import build_session

spark = build_session(app_name="microdump", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
d = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
d.collect()
d.coalesce(1).write.mode("overwrite").parquet("/tmp/microdump_0.parquet")


def dump():
    time.sleep(2.0)
    out = subprocess.run(
        ["jps", "-l"], capture_output=True, text=True
    ).stdout
    pid = next(
        line.split()[0]
        for line in out.splitlines()
        if "SparkSubmit" in line
    )
    js = subprocess.run(
        ["jstack", pid], capture_output=True, text=True
    ).stdout
    Path("/tmp/jstack_write.txt").write_text(js)
    print("dumped", flush=True)


t = threading.Thread(target=dump)
t.start()
t0 = time.time()
d.coalesce(1).write.mode("overwrite").parquet("/tmp/microdump_1.parquet")
print(f"write took {time.time()-t0:.2f}s")
t.join()
spark.stop()
