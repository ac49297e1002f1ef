"""Blocked fuzzy matching / record linkage (functions/linkage.py)."""

import pytest

from linz_bde_uploader_spark.functions.linkage import (
    fuzzy_join,
    fuzzy_name_pairs,
    name_dictionary,
    oversized_blocks,
)


def _lev(a, b):
    # reference DP twin
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return d[n]


class TestFuzzyNamePairs:
    NAMES = [
        "red widget", "red widge",      # dist 1, co-blocked by "red"
        "blue bolt", "blue boat",       # dist 2 via first token
        "small gear", "smol gear",      # dist 2 via LAST token only
        "green gizmo",                  # no partner
    ]

    @pytest.fixture(scope="class")
    def names(self, spark):
        rows = [(n,) for n in self.NAMES for _ in range(2)] + [("red widget",)]
        df = spark.createDataFrame(rows, "name string")
        return name_dictionary(df, "name")

    def test_dictionary_support_counts(self, names):
        got = {r.name: r.support for r in names.collect()}
        assert got["red widget"] == 3 and got["blue bolt"] == 2

    def test_pairs_match_brute_force(self, names):
        got = {
            (r.name_a, r.name_b): r.dist
            for r in fuzzy_name_pairs(names, max_dist=2).collect()
        }
        # brute-force twin restricted to co-blocked pairs
        def blocks(n):
            t = n.split(" ")
            return {t[0], t[-1]}
        expect = {}
        for i, a in enumerate(self.NAMES):
            for b in self.NAMES[i + 1:]:
                x, y = sorted((a, b))
                if blocks(x) & blocks(y) and _lev(x, y) <= 2:
                    expect[(x, y)] = _lev(x, y)
        assert got == expect
        assert ("red widge", "red widget") in got
        assert got[("small gear", "smol gear")] == 2  # last-token pass
        # supports surface on the pair row
        row = [
            r for r in fuzzy_name_pairs(names, max_dist=2).collect()
            if r.name_a == "red widge"
        ][0]
        assert (row.support_a, row.support_b) == (2, 3)

    def test_pair_found_by_both_passes_counts_once(self, spark):
        d = name_dictionary(
            spark.createDataFrame(
                [("red bolt",), ("red bolt x",)], "name string"
            ),
            "name",
        )
        # co-blocked by "red" only; dist 2; exactly one row
        assert fuzzy_name_pairs(d, max_dist=2).count() == 1

    def test_skew_guard_drops_and_reports_oversized_blocks(self, spark):
        rows = [(f"common tail{i}",) for i in range(12)] + [
            ("rare bird",), ("rare bird2",)
        ]
        d = name_dictionary(spark.createDataFrame(rows, "name string"), "name")
        pairs = fuzzy_name_pairs(d, max_dist=2, max_block=10)
        names_in_pairs = {
            n for r in pairs.collect() for n in (r.name_a, r.name_b)
        }
        # the "common" block (12 members) is dropped; the rare pair stays
        assert names_in_pairs == {"rare bird", "rare bird2"}
        dropped = {
            r.block_key: r.n_names
            for r in oversized_blocks(d, max_block=10).collect()
        }
        assert dropped == {"common": 12}

    def test_max_dist_zero_and_negative(self, spark, names):
        assert fuzzy_name_pairs(names, max_dist=0).count() == 0
        with pytest.raises(ValueError):
            fuzzy_name_pairs(names, max_dist=-1)


class TestFuzzyJoin:
    def test_dirty_to_clean_catalog(self, spark):
        clean = spark.createDataFrame(
            [(1, "red widget"), (2, "blue bolt"), (3, "green gizmo")],
            "pid long, pname string",
        )
        dirty = spark.createDataFrame(
            [(10, "red widge"), (11, "blue bolt"), (12, "purple hat")],
            "oid long, oname string",
        )
        got = {
            (r.oid, r.pid): r._dist
            for r in fuzzy_join(dirty, clean, "oname", "pname", 2).collect()
        }
        assert got == {(10, 1): 1, (11, 2): 0}

    def test_row_multiplicity_flows_through_bridge(self, spark):
        # two identical dirty rows must each match the clean row
        clean = spark.createDataFrame([(1, "red widget")], "pid long, pname string")
        dirty = spark.createDataFrame(
            [(10, "red widge"), (11, "red widge")], "oid long, oname string"
        )
        out = fuzzy_join(dirty, clean, "oname", "pname", 2)
        assert sorted(r.oid for r in out.collect()) == [10, 11]

    def test_best_matches_min_dist_deterministic_tiebreak(self, spark):
        from linz_bde_uploader_spark.functions.linkage import best_matches

        clean = spark.createDataFrame(
            # two candidates at equal distance 1 from "red bolt":
            # tie must resolve to the lexicographically smaller name
            [(1, "red bolts"), (2, "red bolt2"), (3, "blue jay")],
            "pid long, pname string",
        )
        dirty = spark.createDataFrame(
            [(10, "red bolt"), (11, "nomatch zz"), (12, "blue jay")],
            "oid long, oname string",
        )
        got = {
            r.dirty_name: (r.match_name, r.dist)
            for r in best_matches(dirty, clean, "oname", "pname", 2).collect()
        }
        assert got["red bolt"] == ("red bolt2", 1)
        assert got["blue jay"] == ("blue jay", 0)
        assert got["nomatch zz"] == ("", -1)  # sentinel, not dropped

    def test_colliding_right_columns_get_suffixed(self, spark):
        # r8 ADVICE: shared column names (common for key columns) must
        # come out addressable — right side suffixed to _r_<name>.
        clean = spark.createDataFrame(
            [(1, "red widget")], "id long, name string"
        )
        dirty = spark.createDataFrame(
            [(10, "red widge")], "id long, name string"
        )
        out = fuzzy_join(dirty, clean, "name", "name", 2)
        assert out.columns == [
            "id", "name", "_match_name", "_dist", "_r_id", "_r_name"
        ]
        r = out.collect()[0]
        assert (r.id, r._r_id, r._r_name, r._dist) == (10, 1, "red widget", 1)

    def test_plan_has_no_cartesian(self, spark):
        clean = spark.createDataFrame([(1, "a b")], "pid long, pname string")
        dirty = spark.createDataFrame([(2, "a c")], "oid long, oname string")
        plan = fuzzy_join(dirty, clean, "oname", "pname", 2)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
