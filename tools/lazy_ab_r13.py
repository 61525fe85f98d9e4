"""Interleaved eager-vs-lazy localCheckpoint A/B (r12 harness, committed
r13 for VERDICT task 6): monkeypatches DataFrame.localCheckpoint to force
the eager leg, alternates eager/lazy min-of-N per key with /proc/stat
steal%% around each run.  Usage: python tools/lazy_ab_r13.py key1 key2"""
import time, sys, os, gc, json
sys.path.insert(0, "/root/repo")
import pyspark.sql.dataframe as D
import __spark_entry__ as e
from quackflight_spark.session import get_spark
from quackflight_spark.pipeline.frame_cache import clear_frames

orig_lc = D.DataFrame.localCheckpoint
FORCE_EAGER = {"on": False}
def lc(self, eager=True):
    return orig_lc(self, eager=True if FORCE_EAGER["on"] else eager)
D.DataFrame.localCheckpoint = lc

spark = get_spark(app_name="lazy_ab")
SF = "/root/testdata/sf0.1"
qs = e.queries()
KEYS = sys.argv[1:]
N = int(os.environ.get("N_AB", "4"))

def steal():
    f = open('/proc/stat').readline().split()
    vals = list(map(int, f[1:]))
    return vals[7], sum(vals)

def run(key):
    t0 = time.perf_counter()
    qs[key](spark, SF).count()
    dt = time.perf_counter() - t0
    clear_frames(); spark.catalog.clearCache(); gc.collect()
    return dt

res = {}
for key in KEYS:
    # warm-up once per variant
    FORCE_EAGER["on"] = True; run(key)
    FORCE_EAGER["on"] = False; run(key)
    eager_t, lazy_t = [], []
    for i in range(N):
        FORCE_EAGER["on"] = True
        s0,t0s = steal(); eager_t.append(run(key)); s1,t1s = steal()
        st_e = 100*(s1-s0)/max(1,t1s-t0s)
        FORCE_EAGER["on"] = False
        s0,t0s = steal(); lazy_t.append(run(key)); s1,t1s = steal()
        st_l = 100*(s1-s0)/max(1,t1s-t0s)
    res[key] = {"eager_min": round(min(eager_t),3), "lazy_min": round(min(lazy_t),3),
                "eager": [round(x,3) for x in eager_t], "lazy": [round(x,3) for x in lazy_t]}
    print(key, json.dumps(res[key]), flush=True)
