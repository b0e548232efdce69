"""E3 candidate validator: the literal DFA walk vs the relational collapse,
property-tested on random marker sequences, plus the Spark operator."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from marie_ai_spark.operators.validator import (
    cutpoint_markers,
    validate_sections,
    validated_boilerplate_sections,
)
from marie_ai_spark.ref_ops.validator import dfa_sections


def collapsed(markers, end_pos):
    """The relational form: every START closes at the next marker or end."""
    seq = sorted(markers, key=lambda m: (m[0], m[1]))
    out = []
    for i, (pos, kind) in enumerate(seq):
        if kind != "START":
            continue
        if i + 1 < len(seq):
            npos, nkind = seq[i + 1]
            out.append(
                (pos, npos, "start-stop" if nkind == "STOP" else "start-start")
            )
        else:
            out.append((pos, end_pos, "run-to-end"))
    return out


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.sampled_from(["START", "STOP"]),
        ),
        max_size=12,
        unique_by=lambda m: m,  # one marker kind per position at most
    )
)
@settings(max_examples=300, deadline=None)
def test_dfa_equals_relational_collapse(markers):
    end_pos = 40
    assert dfa_sections(markers, end_pos) == collapsed(markers, end_pos)


def test_dfa_handcrafted_repairs():
    # nested/consecutive starts: first section closes at the second start
    assert dfa_sections([(1, "START"), (5, "START"), (9, "STOP")], 20) == [
        (1, 5, "start-start"),
        (5, 9, "start-stop"),
    ]
    # leading stop emits nothing; crossing start-stop pairs repair forward
    assert dfa_sections([(2, "STOP"), (4, "START"), (8, "STOP")], 20) == [
        (4, 8, "start-stop")
    ]
    # trailing unmatched start runs to end-of-context
    assert dfa_sections(
        [(1, "START"), (3, "STOP"), (5, "STOP"), (7, "START")], 20
    ) == [(1, 3, "start-stop"), (7, 20, "run-to-end")]
    assert dfa_sections([], 20) == []
    # same-position tie: START sorts before STOP
    assert dfa_sections([(4, "STOP"), (4, "START")], 20) == [
        (4, 4, "start-stop")
    ]


def test_spark_matches_dfa_on_random_sequences(spark):
    rng = random.Random(7)
    rows = []
    want = {}
    for t in range(200):
        n_lines = rng.randint(4, 20)
        markers = []
        for pos in rng.sample(range(n_lines), rng.randint(0, min(5, n_lines))):
            markers.append((pos, rng.choice(["START", "STOP"])))
        lines = ["x"] * n_lines
        for pos, kind in markers:
            lines[pos] = (
                "BEGIN BOILERPLATE" if kind == "START" else "END BOILERPLATE"
            )
        rows.append(("c", t, "\n".join(lines)))
        want[("c", t)] = dfa_sections(markers, n_lines)
    sdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )
    got = {}
    for r in validated_boilerplate_sections(sdf).collect():
        got.setdefault((r.conv_id, r.turn_idx), []).append(
            (r.start_line, r.stop_line, r.transition)
        )
    for k in got:
        got[k].sort()
    want_nonempty = {k: sorted(v) for k, v in want.items() if v}
    assert got == want_nonempty
