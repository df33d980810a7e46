import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ph_ee_nats_importer_rdbms_spark.session import build_session
from ph_ee_nats_importer_rdbms_spark.analytics import similarity as sim

sf_dir = sys.argv[1]
spark = build_session(app_name="semdedup-scale")
t0 = time.perf_counter()
df = sim.q_semdedup(spark, sf_dir)   # staged: first call = cold build
n = df.count()
cold = time.perf_counter() - t0
t0 = time.perf_counter()
n2 = sim.q_semdedup(spark, sf_dir).count()
warm = time.perf_counter() - t0
dropped = df.filter("dropped").count()
print(json.dumps({"sf_dir": sf_dir, "rows": n, "dropped": dropped,
                  "cold_sec": round(cold,1), "warm_sec": round(warm,2)}))
