"""S11 Adlib sink: Spark string-concat XML vs real ElementTree
serialization from the ref_ops twin (attribute order, escaping,
self-closing forms must be byte-equal)."""

import json

import pytest

from marie_ai_spark.operators.layout import adlib_summary, serialize_adlib
from marie_ai_spark.ref_ops.adlib import render_page_xml, render_summary_xml
from marie_ai_spark.sources.transcripts import gen_pandas


@pytest.fixture(scope="module")
def corpus():
    return gen_pandas(120, seed=42)


def _pdf_docs(corpus):
    for row in corpus.itertuples():
        t = (row.text or "").lstrip()
        if t.startswith("{") and '"pages"' in t[:256]:
            yield row, json.loads(row.text)


def test_adlib_pages_byte_equal(spark, corpus):
    got = {
        (r.conv_id, r.turn_idx, r.page): (r.page_xml, r.n_words)
        for r in serialize_adlib(spark.createDataFrame(corpus)).collect()
    }
    want = {}
    for row, doc in _pdf_docs(corpus):
        for pg in doc["pages"]:
            want[(row.conv_id, row.turn_idx, pg["page"])] = (
                render_page_xml(
                    pg["page"] + 1, pg["width"], pg["height"], pg["words"]
                ),
                len(pg["words"]),
            )
    assert len(want) > 10
    assert got == want


def test_adlib_summary_byte_equal(spark, corpus):
    got = {
        (r.conv_id, r.turn_idx): (r.summary_xml, r.n_pages)
        for r in adlib_summary(spark.createDataFrame(corpus)).collect()
    }
    want = {
        (row.conv_id, row.turn_idx): (
            render_summary_xml(len(doc["pages"])),
            len(doc["pages"]),
        )
        for row, doc in _pdf_docs(corpus)
    }
    assert got == want


def test_adlib_summary_noncontiguous_pages(spark):
    """Filenames come from the sorted page ORDINAL, not the page value: a
    document with pages {3, 7} still lists 1.tif.xml and 2.tif.xml exactly
    like the twin's range(n_pages) enumeration."""
    import json

    doc = json.dumps(
        {
            "pages": [
                {"page": 7, "width": 100, "height": 100, "words": []},
                {"page": 3, "width": 100, "height": 100, "words": []},
            ]
        },
        separators=(",", ":"),
    )
    sdf = spark.createDataFrame(
        [("c1", 0, doc)], "conv_id string, turn_idx int, text string"
    )
    (row,) = adlib_summary(sdf).collect()
    assert row.summary_xml == render_summary_xml(2)
    assert row.n_pages == 2


def test_adlib_escaping(spark):
    """Attribute escaping must match ElementTree exactly."""
    words = [{"id": 0, "text": 'a<b&"c>d', "box": [150, 200, 90, 40], "conf": 0.95}]
    payload = json.dumps(
        {"pages": [{"page": 0, "width": 2550, "height": 3300, "words": words}]},
        separators=(",", ":"),
    )
    sdf = spark.createDataFrame(
        [("c", 0, payload)], "conv_id string, turn_idx int, text string"
    )
    got = serialize_adlib(sdf).first().page_xml
    want = render_page_xml(1, 2550, 3300, words)
    assert got == want
    assert "&lt;" in got and "&amp;" in got and "&quot;" in got and "&gt;" in got
