"""Cross-turn continuation: pure-Python semantics, evolve/apply agreement,
and Spark three-pass pipeline vs the conversation oracle."""

import random

import pandas as pd
import pytest

from marie_ai_spark.operators.continuation import extract_with_continuation
from marie_ai_spark.ref_ops import (
    DEFAULT_RULES,
    evolve_open_state,
    extract_conversation,
    extract_turn,
    extract_turn_stateful,
    turn_events_for_text,
)
from marie_ai_spark.sources.transcripts import crosses_turn_boundary, gen_pandas


class TestStatefulSemantics:
    def test_open_section_drops_into_next_turn(self):
        t1 = "keep1\nBEGIN BOILERPLATE\njunk tail"
        t2 = "junk head\nEND BOILERPLATE\nkeep2"
        out = extract_conversation([t1, t2])
        assert out[0]["clean_text"] == "keep1"
        assert out[1]["clean_text"] == "keep2"
        # stateless per-turn leaves the junk head in t2
        assert extract_turn(t2)["clean_text"] == "junk head\nEND BOILERPLATE\nkeep2"

    def test_section_spans_many_turns(self):
        turns = [
            "keep\nBEGIN BOILERPLATE",
            "all junk",
            "more junk",
            "END BOILERPLATE\nkeep end",
        ]
        out = extract_conversation(turns)
        assert [r["clean_text"] for r in out] == ["keep", "", "", "keep end"]
        # dropped turns keep their spans marked
        assert all(s[3] == "drop" for s in out[1]["spans"])

    def test_state_passes_through_other_kinds(self):
        turns = [
            "keep\nBEGIN BOILERPLATE",
            '{"status":"ok","url":"u","content":"tool text"}',  # tool_log
            "END BOILERPLATE\nkeep2",
        ]
        out = extract_conversation(turns)
        assert out[1]["clean_text"] == "tool text"  # unaffected kind
        assert out[2]["clean_text"] == "keep2"

    def test_closed_sections_do_not_leak(self):
        turns = ["a\nBEGIN BOILERPLATE\nx\nEND BOILERPLATE\nb", "c\nd"]
        out = extract_conversation(turns)
        assert out[0]["clean_text"] == "a\nb"
        assert out[1]["clean_text"] == "c\nd"


class TestEvolveAgreesWithApply:
    def test_random_marker_sequences(self):
        """Property: the event-based transition (pass B) must equal the
        full rule application's exit state (pass C) for random turns."""
        rng = random.Random(7)
        vocab = ["plain line", "BEGIN BOILERPLATE", "END BOILERPLATE",
                 "other text here", "more words"]
        for _ in range(500):
            text = "\n".join(
                rng.choice(vocab) for _ in range(rng.randint(1, 10))
            )
            for entry in (frozenset(), frozenset({"r-boilerplate"})):
                _r, exit_apply = extract_turn_stateful(
                    text, DEFAULT_RULES, entry
                )
                events = turn_events_for_text(text, DEFAULT_RULES)
                exit_evolve = evolve_open_state(entry, events, DEFAULT_RULES)
                assert exit_apply == exit_evolve, (text, entry)


@pytest.fixture(scope="module")
def conv_df():
    df = gen_pandas(250, seed=42)
    # make sure the fixture actually contains cross-turn sections
    crossing = [
        (int(c.split("-")[1]), t)
        for c, t in zip(df.conv_id, df.turn_idx)
        if crosses_turn_boundary(int(c.split("-")[1]), int(t), 42)
    ]
    assert crossing, "fixture has no cross-turn sections; raise the rate"
    return df


def test_spark_continuation_matches_conversation_oracle(spark, conv_df):
    got = (
        extract_with_continuation(spark.createDataFrame(conv_df))
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    want_rows = []
    for cid, g in conv_df.sort_values(["conv_id", "turn_idx"]).groupby(
        "conv_id", sort=True
    ):
        for (_, row), r in zip(
            g.iterrows(), extract_conversation(list(g.text))
        ):
            want_rows.append(
                (cid, row.turn_idx, r["clean_text"], r["n_lines"],
                 [tuple(s) for s in r["spans"]])
            )
    want = pd.DataFrame(
        want_rows,
        columns=["conv_id", "turn_idx", "clean_text", "n_lines", "spans"],
    )
    assert list(got.conv_id) == list(want.conv_id)
    assert list(got.turn_idx) == list(want.turn_idx)
    assert list(got.clean_text) == list(want.clean_text)
    assert list(got.n_lines) == list(want.n_lines)
    got_spans = [
        [(s["start"], s["end"], s["label"], s["action"]) for s in sl]
        for sl in got.spans
    ]
    assert got_spans == list(want.spans)


def test_continuation_differs_from_stateless_where_expected(spark, conv_df):
    from marie_ai_spark.operators.extract import extract_transcripts

    sdf = spark.createDataFrame(conv_df)
    cont = extract_with_continuation(sdf).orderBy("conv_id", "turn_idx").toPandas()
    flat = extract_transcripts(sdf).orderBy("conv_id", "turn_idx").toPandas()
    diff = (cont.clean_text.values != flat.clean_text.values).sum()
    assert diff > 0  # continuation is load-bearing on this fixture
