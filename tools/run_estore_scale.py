import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ph_ee_nats_importer_rdbms_spark.session import build_session
from ph_ee_nats_importer_rdbms_spark.analytics import incremental_embeddings as ie

sf_dir = sys.argv[1]
spark = build_session(app_name="estore-scale")
t0 = time.perf_counter()
root = ie.staged_embedding_store_root(spark, sf_dir)  # cold: build+append
cold = time.perf_counter() - t0
t0 = time.perf_counter()
n_pairs = ie.read_pairs(spark, root).count()
read_warm = time.perf_counter() - t0
t0 = time.perf_counter()
n_lab = ie.read_labels(spark, root).count()
read_lab = time.perf_counter() - t0
print(json.dumps({"sf_dir": sf_dir, "pairs": n_pairs, "labeled": n_lab,
                  "build_cold_sec": round(cold,1),
                  "pairs_read_sec": round(read_warm,2),
                  "labels_read_sec": round(read_lab,2)}))
