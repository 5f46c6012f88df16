"""Reference API parity layer: the four-function surface of
``table_ocr/__init__.py:9-17`` mapped onto the engine."""

import table_ocr_spark as tos
from table_ocr_spark.datagen import write_pages_parquet


def test_run_lifecycle(spark, tmp_path):
    pq = str(tmp_path / "pages.parquet")
    write_pages_parquet(pq, n_docs=40, seed=5, dup_frac=0)
    pages = spark.read.parquet(pq)
    out = str(tmp_path / "run")

    st = tos.get_run_state(spark, out, num_buckets=8)
    assert st.state == "PENDING"

    rep = tos.create_extraction_run(spark, pages, out, num_buckets=8, wave_size=8)
    assert rep.run_id == "run1"
    assert rep.buckets_processed == 8

    st = tos.get_run_state(spark, out, num_buckets=8)
    assert st.state == "SUCCEEDED" and st.buckets_done == 8

    results = tos.read_run_results(spark, out)
    assert results.count() == 40
    # direct mode == batch mode output (modulo the bucket column)
    direct = {r["url"]: r["extracted_text"] for r in tos.extract_pages(pages).collect()}
    for r in results.select("url", "extracted_text").collect():
        assert direct[r["url"]] == r["extracted_text"]

    # re-submit is a no-op with a bumped run counter (ui/utils.py:94-123)
    rep2 = tos.create_extraction_run(spark, pages, out, num_buckets=8)
    assert rep2.buckets_processed == 0
    assert rep2.run_id == "run2"
