"""Decade-scale driver for the incremental curation store: staged build
(two deliveries, compacted BM25 partials riding the same transactions)
plus the store-backed read paths — the evidence that the round-12
postings compaction holds at 10x corpus (pairs with decade_r11/r12
rows for the SemDeDup and embedding stores)."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ph_ee_nats_importer_rdbms_spark.session import build_session
from ph_ee_nats_importer_rdbms_spark.analytics import incremental_curation as icur
from ph_ee_nats_importer_rdbms_spark.analytics import search

sf_dir = sys.argv[1]
spark = build_session(app_name="cstore-scale")
t0 = time.perf_counter()
root = icur.staged_curation_store_root(spark, sf_dir)  # cold: build + append
cold = time.perf_counter() - t0
t0 = time.perf_counter()
n_bm25 = search.read_bm25_search(spark, root).count()  # first read: collects + construct
bm25_first = time.perf_counter() - t0
t0 = time.perf_counter()
search.read_bm25_search(spark, root).count()  # memoized warm
bm25_warm = time.perf_counter() - t0
t0 = time.perf_counter()
n_cur = icur.read_curation(spark, root).count()
cur_read = time.perf_counter() - t0
print(json.dumps({"sf_dir": sf_dir, "build_cold_sec": round(cold, 1),
                  "bm25_rows": n_bm25, "bm25_first_sec": round(bm25_first, 2),
                  "bm25_warm_sec": round(bm25_warm, 3),
                  "curation_rows": n_cur, "curation_read_sec": round(cur_read, 2)}))
