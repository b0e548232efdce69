"""Cross-validation of the Spark-relational layout pipeline against the
procedural ref_ops path, plus tokenizer/chunking/voting operators."""

import pytest

from pyspark.sql import functions as F

from marie_ai_spark.operators.extract import extract_transcripts
from marie_ai_spark.operators.layout import pdf_layout_pipeline
from marie_ai_spark.operators.tokenize import (
    chunk_tokens,
    encode_text,
    tokenize_extracted,
)
from marie_ai_spark.operators.voting import ensemble_extract, vote_best_extraction
from marie_ai_spark.sources.transcripts import gen_pandas


@pytest.fixture(scope="module")
def transcripts(spark):
    return spark.createDataFrame(gen_pandas(150, seed=11)).cache()


def test_relational_layout_matches_procedural(spark, transcripts):
    """Two independent implementations of the word-box -> text semantics
    (pure DataFrame algebra vs the shared procedural module) must agree
    byte-for-byte on every pdf_words turn."""
    relational = pdf_layout_pipeline(transcripts).toPandas()
    procedural = (
        extract_transcripts(transcripts)
        .filter(F.col("doc_kind") == "pdf_words")
        .select("conv_id", "turn_idx", "clean_text", "n_lines")
        .toPandas()
    )
    assert len(relational) == len(procedural) > 0
    key = ["conv_id", "turn_idx"]
    m = relational.merge(procedural, on=key, suffixes=("_rel", "_proc"))
    assert len(m) == len(relational)
    diff = m[m.clean_text_rel != m.clean_text_proc]
    assert diff.empty, diff.head(2).to_dict("records")
    assert (m.n_lines_rel == m.n_lines_proc).all()


def test_tokenizer_roundtrip(spark, transcripts):
    ext = extract_transcripts(transcripts)
    tok = tokenize_extracted(ext)
    got = {
        (r.conv_id, r.turn_idx): list(r.token_ids)
        for r in tok.limit(2000).collect()
    }
    want_src = {
        (r.conv_id, r.turn_idx): r.clean_text
        for r in ext.select("conv_id", "turn_idx", "clean_text").collect()
    }
    assert got
    for k, ids in got.items():
        assert ids == encode_text(want_src[k])


def test_chunking_covers_all_tokens(spark, transcripts):
    tok = tokenize_extracted(extract_transcripts(transcripts))
    chunks = chunk_tokens(tok, max_len=32, overlap=8)
    joined = (
        chunks.groupBy("conv_id", "turn_idx")
        .agg(
            F.max("chunk_len").alias("max_len"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .join(tok, ["conv_id", "turn_idx"])
        .collect()
    )
    for r in joined:
        assert r.max_len <= 32
        if r.n_tokens > 0:
            # starts at 0, stride 24, last start <= max(n_tokens-overlap-1, 0)
            # (a start inside the previous chunk's coverage would emit a
            # wholly-duplicated trailing chunk)
            assert r.n_chunks == max(r.n_tokens - 8 - 1, 0) // 24 + 1


def test_voting_prefers_richer_variant(spark, transcripts):
    ens = ensemble_extract(transcripts)
    best = vote_best_extraction(ens)
    n_turns = transcripts.count()
    assert best.count() == n_turns
    # the no_rules variant never deletes lines, so NEGATION-affected plain
    # turns must pick it (more lines) under the (n_lines, len) score
    boiler = best.filter(F.col("clean_text").contains("BEGIN BOILERPLATE"))
    assert boiler.filter(F.col("variant") != "no_rules").count() == 0


def test_geometry_helpers(spark, transcripts):
    from marie_ai_spark.operators.layout import (
        knn_words,
        parse_words,
        quantize_boxes,
        words_in_region,
        xywh_to_xyxy,
    )

    words = parse_words(transcripts)
    one = words.select(
        "x", "y", "wd", "ht", xywh_to_xyxy(
            F.array("x", "y", "wd", "ht")).alias("xyxy")
    ).first()
    assert one.xyxy == [one.x, one.y, one.x + one.wd, one.y + one.ht]

    q = quantize_boxes(words).select("qx", "qy").toPandas()
    assert q.qx.between(0, 99).all() and q.qy.between(0, 99).all()

    region = words_in_region(words, 0, 0, 400, 260).toPandas()
    assert len(region) > 0
    assert (region.x < 400).all() and (region.y < 260).all()

    knn = knn_words(words, 100, 200, k=3)
    grp = knn.groupBy("conv_id", "turn_idx", "page").count().toPandas()
    assert (grp["count"] <= 3).all()
    # rank 1 is the closest: distance non-decreasing with rank
    pdfk = knn.toPandas().sort_values(["conv_id", "turn_idx", "page", "knn_rank"])
    for _, g in pdfk.groupby(["conv_id", "turn_idx", "page"]):
        assert list(g.dist) == sorted(g.dist)


def test_serialize_blobs_xml(spark):
    from marie_ai_spark.operators.layout import serialize_blobs

    words = spark.createDataFrame(
        [("c", 0, 0, 1, "a<b", 10, 20, 30, 40, 1.0),
         ("c", 0, 0, 2, "ok", 50, 20, 30, 40, 1.0)],
        "conv_id string, turn_idx int, page int, word_id int, word string, "
        "x int, y int, wd int, ht int, conf double",
    )
    row = serialize_blobs(words).first()
    assert row.n_blobs == 2
    assert row.blobs_xml.startswith("<blobs><blob x=\"10\"")
    assert "a&lt;b" in row.blobs_xml  # XML escaping
    assert row.blobs_xml.endswith("</blobs>")


def test_run_report(spark, tmp_path):
    from marie_ai_spark.plans.lineage import run_report
    from marie_ai_spark.plans.pipeline import run_extract
    from marie_ai_spark.sources.transcripts import gen_pandas

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    spark.createDataFrame(gen_pandas(20, seed=2)).write.parquet(inp)
    run_extract(spark, inp, out, run_id="rep", n_buckets=4)
    r = run_report(spark, out).first()
    assert r.run_id == "rep" and r.buckets_done == 4
    assert r.buckets_failed == 0 and r.rows_out > 0


def test_vote_words_argmax(spark):
    from marie_ai_spark.operators.voting import vote_words

    cols = ("conv_id string, turn_idx int, page int, word_id int, "
            "word string, conf double")
    e1 = spark.createDataFrame(
        [("c", 0, 0, 1, "heIlo", 0.91), ("c", 0, 0, 2, "world", 0.99)], cols)
    e2 = spark.createDataFrame(
        [("c", 0, 0, 1, "hello", 0.97), ("c", 0, 0, 2, "w0rld", 0.80)], cols)
    out = {r.word_id: (r.word, r.engine)
           for r in vote_words({"trocr": e1, "paddle": e2}).collect()}
    assert out[1] == ("hello", "paddle")  # higher confidence wins
    assert out[2] == ("world", "trocr")


def test_chunking_no_fully_covered_trailing_chunk(spark):
    """A 512-token doc at max_len=512/overlap=64 must yield ONE chunk, not a
    512 + trailing 64 wholly contained in it; 513 tokens yield two."""
    rows = [("c", 0, list(range(512))), ("c", 1, list(range(513)))]
    tok = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, token_ids array<int>"
    )
    out = {}
    for r in chunk_tokens(tok, max_len=512, overlap=64).collect():
        out.setdefault(r.turn_idx, []).append(r.chunk_len)
    assert out[0] == [512]
    assert sorted(out[1]) == [65, 512]
