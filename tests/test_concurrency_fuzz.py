"""Model-based fuzz of the OPTIMISTIC-CONCURRENCY rebase matrix.

Each step draws a PAIR of DML ops computed against the SAME base
snapshot (expected_parent pinning — the real two-writer shape, made
deterministic): op A publishes first, op B must then either REBASE
onto A's commit or raise CommitConflictError. The table starts as two
groups holding disjoint key halves (left 0-7, right 8-15) and each op
is confined to one half, so:

* opposite-half pairs must BOTH land (group/box disjointness is
  provable from manifest stats) — a conflict here is a lost-write
  bug's mirror image: over-conservative validation that would force
  recompute storms at scale;
* same-half pairs may legitimately go either way (conflict depends on
  which groups A rewrote vs B's boxes) — the metamorphic property is
  that the FINAL TABLE equals the model applied with exactly the ops
  that reported success, in publish order. A landed-but-lost write or
  a conflict-that-still-mutated both break it.

This is the interaction coverage the per-rule rebase tests
(test_versioned.py::TestGroupDisjointConcurrency, the compact/optimize
race tests) can't enumerate: arbitrary interleavings of merge /
pruned delete / pruned update / append across many rounds, with the
key-box layout evolving as merges add groups."""

from __future__ import annotations

import uuid
import os

# soak knob: SPARK_GRAFT_FUZZ_EXAMPLES=N runs N hypothesis examples
# (default 6 for CI speed); setting it also turns derandomize OFF so a
# soak explores NEW seeds instead of replaying the fixed corpus
_FUZZ_EXAMPLES = int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "6"))
_FUZZ_DERANDOMIZE = "SPARK_GRAFT_FUZZ_EXAMPLES" not in os.environ

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from file_stream_import_spark.io.versioned import (
    CommitConflictError,
    VersionedTable,
    merge_into,
)

from .test_model_fuzz import SCHEMA, _apply_model, _df, _read_sorted

LEFT = (0, 7)
RIGHT = (8, 15)


def _half_ops(lo: int, hi: int):
    rows = st.lists(
        st.tuples(st.integers(lo, hi), st.integers(-50, 50)),
        min_size=1,
        max_size=4,
        unique_by=lambda r: r[0],
    )
    rng = st.tuples(st.integers(lo, hi), st.integers(lo, hi))
    return st.one_of(
        st.tuples(st.just("merge"), rows),
        st.tuples(st.just("append"), rows),
        st.tuples(st.just("delete"), rng),
        st.tuples(st.just("update"), rng, st.integers(-9, 9)),
    )


# r12: a WAP publish as the SECOND writer — the branch forks at the
# pair's base, stages an append, and publishes after A landed. The
# rebase contract is exact: it must land iff A was a pure append
# (appends commute; any rewrite/merge/update invalidates the staged
# audit), regardless of key halves (the publish rebase proves safety
# by commit MODES, not key boxes). The staged ROWS are still confined
# to one half, like every other op's: a landed publish adds its group
# to the table, and the suite's opposite-half-must-both-land
# invariant for LATER pairs rests on every group's key box staying
# inside one half (a half-spanning group is legitimately rewritten by
# merges from both halves — a true conflict, as a fresh-seed soak
# demonstrated).
def _wap_ops(lo: int, hi: int):
    return st.tuples(
        st.just("wap"),
        st.lists(
            st.tuples(st.integers(lo, hi), st.integers(-50, 50)),
            min_size=1,
            max_size=4,
        ),
    )


pair_st = st.tuples(
    _half_ops(*LEFT),
    st.one_of(
        _half_ops(*RIGHT),
        _half_ops(*LEFT),
        _wap_ops(*LEFT),
        _wap_ops(*RIGHT),
    ),
)


def _to_model_op(op: tuple) -> tuple:
    kind = op[0]
    if kind == "merge":
        return ("merge", op[1])
    if kind in ("append", "wap"):
        # a landed WAP publish appends exactly the staged rows
        return ("append", op[1])
    if kind == "delete":
        lo, hi = sorted(op[1])
        return ("delete_cow", (lo, hi))
    lo, hi = sorted(op[1])
    return ("update", (lo, hi), op[2])


def _run(table, spark, op: tuple, base: int) -> bool:
    """Execute ``op`` pinned to ``base``; True if it landed."""
    kind = op[0]
    try:
        if kind == "merge":
            merge_into(
                table, spark, _df(spark, op[1]), key="id",
                expected_parent=base,
            )
        elif kind == "append":
            table.commit(
                _df(spark, op[1]), mode="append", expected_parent=base
            )
        elif kind == "delete":
            lo, hi = sorted(op[1])
            table.delete_where(
                spark,
                F.col("id").between(lo, hi),
                prune_where="auto",
                expected_parent=base,
            )
        else:
            lo, hi = sorted(op[1])
            table.update_where(
                spark,
                F.col("id").between(lo, hi),
                {"val": F.col("val") + F.lit(op[2])},
                prune_where="auto",
                expected_parent=base,
            )
        return True
    except CommitConflictError:
        return False


class TestConcurrencyFuzz:
    @settings(
        max_examples=_FUZZ_EXAMPLES,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
            HealthCheck.data_too_large,
        ],
        derandomize=_FUZZ_DERANDOMIZE,
    )
    @given(pairs=st.lists(pair_st, min_size=2, max_size=5))
    def test_pinned_pairs_match_model_of_landed_ops(
        self, spark, tmp_path_factory, pairs
    ):
        base_dir = tmp_path_factory.mktemp("conc_fuzz")
        t = VersionedTable(f"{base_dir}/{uuid.uuid4().hex}")
        left_rows = [(i, i * 10) for i in range(LEFT[0], LEFT[1] + 1)]
        right_rows = [(i, i * 10) for i in range(RIGHT[0], RIGHT[1] + 1)]
        t.commit(_df(spark, left_rows), mode="overwrite")
        t.commit(_df(spark, right_rows), mode="append")
        model = left_rows + right_rows

        for n, (a, b) in enumerate(pairs):
            base = t.latest_version()
            if b[0] == "wap":
                # fork + stage BEFORE A runs, so the branch's fork
                # point is the pair's shared base snapshot
                br = t.create_branch(f"wap{n}")
                br.commit(_df(spark, b[1]), mode="append")
            landed_a = _run(t, spark, a, base)
            assert landed_a, f"first writer must always land: {a}"
            # a zero-touch delete/update is a METADATA NO-OP: it
            # commits no version (its decision "nothing matched" holds
            # at base, and with no publish there is nothing to
            # validate) — main did not actually diverge then
            after_a = t.latest_version()
            diverged = after_a != base
            if b[0] == "wap":
                try:
                    pv = t.publish_branch(f"wap{n}")
                    landed_b = True
                    if diverged:
                        m = t._load_manifest(pv)
                        assert m.get("rebased_from") == base, (
                            "diverged publish lost lineage: "
                            f"{m.get('mode')}"
                        )
                except CommitConflictError:
                    landed_b = False
                t.delete_branch(f"wap{n}")
                assert landed_b == (
                    not diverged or a[0] == "append"
                ), (
                    f"publish after {a}: landed={landed_b}, expected "
                    f"{not diverged or a[0] == 'append'} (rebase iff "
                    "interim is append or main never moved)"
                )
            else:
                landed_b = _run(t, spark, b, base)
                # opposite-half pairs are provably disjoint: B MUST
                # rebase
                a_right = all(LEFT[1] < k for k in _op_keys(a))
                b_right = all(LEFT[1] < k for k in _op_keys(b))
                if a_right != b_right:
                    assert landed_b, (
                        f"disjoint-half pair was refused: {a} then {b}"
                    )
                if landed_b and t.latest_version() == after_a:
                    # B was a zero-touch no-op AT ITS PINNED BASE —
                    # it committed nothing, which serializes it
                    # BEFORE A (legal: it had zero effect at base).
                    # The publish-order model below must not apply
                    # its effect to the post-A state (A may have
                    # concurrently inserted a matching key).
                    landed_b = False
            if landed_a:
                model = _apply_model(model, _to_model_op(a))
            if landed_b:
                model = _apply_model(model, _to_model_op(b))
            got = _read_sorted(t, spark)
            assert got == sorted(model), (
                f"after pair {a} / {b} (landed_b={landed_b}): "
                f"table={got} model={sorted(model)}"
            )
            assert t.count_where(spark) == len(model)


def _op_keys(op: tuple) -> list[int]:
    if op[0] in ("merge", "append"):
        return [k for k, _ in op[1]]
    lo, hi = sorted(op[1])
    return [lo, hi]
