"""Curated package-root API: every advertised symbol resolves lazily."""


def test_all_exports_resolve():
    import ohsome_planet_spark as ops

    for name in ops.__all__:
        assert getattr(ops, name) is not None, name


def test_unknown_attribute_raises():
    import pytest

    import ohsome_planet_spark as ops

    with pytest.raises(AttributeError):
        ops.not_a_real_symbol


def test_api_smoke(spark):
    """The advertised names drive a real mini-pipeline."""
    import ohsome_planet_spark as ops

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "unique")],
        "doc_id long, text string")
    canon = ops.exact_dedup(docs)
    assert canon.count() == 2
    top = ops.bm25_topk(docs, ["unique"], k=1).collect()
    assert top[0]["doc_id"] == 3
