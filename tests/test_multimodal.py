"""Multimodal plumbing: schema convention, Arrow-batch mapInPandas
contracts, determinism across partitionings, frame sampling."""

from pyspark.sql import functions as F

from confluent_data_ingestion_spark.operators.multimodal import (
    decode_media,
    extract_features,
    pack_multimodal,
    register_decoder,
    resize_images,
    sample_frames,
)


def _docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(50)
        .select("doc_id", "text")
    )


def test_pack_multimodal_schema(spark, sf_dir):
    df = pack_multimodal(
        _docs(spark, sf_dir), "encode(text, 'utf-8')", "image",
        {"width": "length(text)", "height": "10"},
    )
    assert dict(df.dtypes)["content"] == "binary"
    assert dict(df.dtypes)["meta"] == "map<string,string>"
    r = df.first()
    assert r["meta"]["height"] == "10" and int(r["meta"]["width"]) > 0


def test_extract_features_shape_and_determinism(spark, sf_dir):
    packed = pack_multimodal(_docs(spark, sf_dir), "encode(text, 'utf-8')", "image")
    f1 = extract_features(packed, feature_dim=8)
    assert "content" not in f1.columns  # binary projected away by default
    rows = f1.collect()
    assert all(len(r["features"]) == 8 for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows for v in r["features"])
    # determinism across a different partitioning (distributed-safe kernel)
    f2 = {r["doc_id"]: r["features"] for r in
          extract_features(packed.repartition(7), feature_dim=8).collect()}
    for r in rows:
        assert f2[r["doc_id"]] == r["features"]


def test_decode_media_stub_and_registry(spark, sf_dir):
    packed = pack_multimodal(
        _docs(spark, sf_dir).limit(5), "encode(text, 'utf-8')", "image",
        {"width": "7", "height": "9"},
    )
    out = decode_media(packed).collect()
    assert all(r["decoded"]["ok"] == "True" for r in out)
    assert all(r["decoded"]["width"] == "7" for r in out)
    # unknown modality -> explicit error record, no crash
    audio = pack_multimodal(_docs(spark, sf_dir).limit(2), "encode(text, 'utf-8')", "audio")
    errs = decode_media(audio).collect()
    assert all("no decoder" in r["decoded"]["error"] for r in errs)
    # registering a decoder routes to it
    register_decoder("audio", lambda b, m: {"n_bytes": len(b)})
    try:
        ok = decode_media(audio).collect()
        assert all(int(r["decoded"]["n_bytes"]) > 0 for r in ok)
    finally:
        from confluent_data_ingestion_spark.operators import multimodal

        del multimodal._STUB_DECODERS["audio"]


def test_sample_frames(spark, sf_dir):
    vids = pack_multimodal(
        _docs(spark, sf_dir).limit(3), "encode(text, 'utf-8')", "video",
        {"duration_ms": "3500"},
    )
    frames = sample_frames(vids, every_ms=1000)
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 3 for r in per_doc)  # 0,1000,2000 (3500//1000)
    offs = sorted(r["frame_offset_ms"] for r in frames.filter(
        F.col("doc_id") == per_doc[0]["doc_id"]).collect())
    assert offs == [0, 1000, 2000]


def test_resize_images_meta(spark, sf_dir):
    packed = pack_multimodal(
        _docs(spark, sf_dir).limit(4), "encode(text, 'utf-8')", "image",
        {"width": "640", "height": "480"},
    )
    out = resize_images(packed, width=64, height=64).collect()
    assert all(r["meta"]["width"] == "64" and r["meta"]["resized"] == "stub"
               for r in out)
    assert all(r["content"] is not None for r in out)  # payload preserved


def test_embed_topk_lsh_recall_vs_exact(spark, sf_dir):
    """The flagship multimodal composite runs the banded-LSH scale path;
    this pins its recall@5 against the exact-cosine baseline over the SAME
    extracted features (the signature-centered planes must keep >= 0.9 of
    the true neighbors while pruning most of the corpus scan)."""
    from confluent_data_ingestion_spark.operators.similarity import (
        cosine_topk,
        lsh_topk,
        recall_at_k,
    )
    from confluent_data_ingestion_spark.queries import _MM_PLANES

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    packed = pack_multimodal(docs, "encode(text, 'utf-8')", "image", {})
    feats = extract_features(packed.drop("text"), feature_dim=8).select(
        "doc_id", "features"
    )
    q = feats.filter(F.col("doc_id") % 100 == 0)
    exact = cosine_topk(feats, q, k=5, id_col="doc_id", vec_col="features")
    approx = lsh_topk(feats, q, _MM_PLANES, k=5, bands=6, center=0.5,
                      id_col="doc_id", vec_col="features")
    recall = recall_at_k(approx, exact).collect()[0]["recall"]
    assert recall >= 0.9, f"LSH recall@5 {recall} below 0.9"
