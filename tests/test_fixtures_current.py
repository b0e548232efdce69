"""Guard: the checked-in driver-oracle fixtures must match what
tools/make_fixtures.py would produce from the current code. If ref_ops or
the transcript generator changes without regenerating fixtures, the DuckDB
oracle would silently pin stale expectations — fail loudly here instead."""

import os

import pandas as pd
import pytest

from tools import make_fixtures as mk

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "")
FIX = os.path.join(os.path.dirname(mk.__file__), "..", "fixtures")


@pytest.fixture(scope="module")
def tr():
    return mk.transcripts_df()


@pytest.fixture(scope="module")
def ex(tr):
    return mk.extract_oracle(tr)


def _eq(df: pd.DataFrame, fname: str):
    on_disk = pd.read_parquet(os.path.join(FIX, fname))
    fresh = df.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        on_disk.reset_index(drop=True), fresh, check_dtype=False
    )


def test_transcripts_fixture_current(tr):
    _eq(tr[["conv_id", "turn_idx", "text"]], "transcripts_c100_s42.parquet")


def test_extract_fixture_current(ex):
    _eq(
        ex[["conv_id", "turn_idx", "doc_kind", "clean_text", "n_lines"]],
        os.path.join("oracle", "extract_transcripts_c100.parquet"),
    )


def test_continuation_fixture_current(tr):
    _eq(
        mk.continuation_oracle(tr),
        os.path.join("oracle", "extract_continuation_c100.parquet"),
    )


def test_grid_fixture_current(tr):
    _eq(mk.grid_oracle(tr), os.path.join("oracle", "extract_grid_c100.parquet"))


def test_rollup_fixture_current(ex):
    _eq(
        mk.rollup_oracle(ex),
        os.path.join("oracle", "conversation_rollup_c100.parquet"),
    )


def test_span_regions_fixture_current(ex):
    _eq(
        mk.span_regions_oracle(ex),
        os.path.join("oracle", "span_regions_c100.parquet"),
    )


def test_multiline_fixture_current(tr):
    _eq(
        mk.multiline_oracle(tr),
        os.path.join("oracle", "multiline_blocks_c100.parquet"),
    )


def test_hybrid_fixture_current(tr):
    _eq(
        mk.hybrid_oracle(tr),
        os.path.join("oracle", "hybrid_annotate_c100.parquet"),
    )


def test_adlib_fixtures_current(tr):
    _eq(
        mk.adlib_pages_oracle(tr),
        os.path.join("oracle", "adlib_pages_c100.parquet"),
    )
    _eq(
        mk.adlib_summary_oracle(tr),
        os.path.join("oracle", "adlib_summary_c100.parquet"),
    )


def test_blobs_fixture_current(tr):
    _eq(
        mk.blobs_oracle(tr),
        os.path.join("oracle", "serialize_blobs_c100.parquet"),
    )


def test_box_merge_fixtures_current(tr):
    _eq(mk.merge_iou_oracle(tr), os.path.join("oracle", "merge_iou_c100.parquet"))
    _eq(
        mk.merge_horizontal_oracle(tr),
        os.path.join("oracle", "merge_horizontal_c100.parquet"),
    )


def test_training_pipeline_fixture_current(tr):
    _eq(
        mk.training_pipeline_oracle(tr),
        os.path.join("oracle", "training_pipeline_c100.parquet"),
    )
