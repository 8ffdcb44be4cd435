"""OGR SQL dialect front-end — conformance cases modeled on
autotest/ogr/ogr_sql_test.py and ogr_join_test.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gdal_spark import ogrsql


@pytest.fixture(scope="module")
def tables(spark):
    poly = spark.createDataFrame(
        pd.DataFrame(
            {
                "fid": range(10),
                "eas_id": [168, 179, 171, 173, 172, 169, 166, 158, 165, 170],
                "prfedea": [f"35043{k}" for k in range(10)],
                "area": [215229.0, 247328.0, 261752.0, 547597.0, 15775.0,
                         101429.0, 268597.0, 1634833.0, 596610.0, 5268.0],
            }
        )
    )
    idlink = spark.createDataFrame(
        pd.DataFrame(
            {
                "ilk_fid": range(7),
                "eas_id": [158, 165, 166, 168, 169, 170, 171],
                "name": ["N158", "N165", "N166", "N168", "N169",
                         "N170", "N171"],
            }
        )
    )
    return {"poly": poly, "idlink": idlink}


def run(tables, sql):
    return ogrsql.execute(tables, sql)


class TestSelect:
    def test_project_alias_arith(self, tables):
        rows = run(
            tables,
            "SELECT eas_id AS id, area / 2 AS half FROM poly "
            "WHERE eas_id >= 170 ORDER BY id",
        ).collect()
        assert [r.id for r in rows] == [170, 171, 172, 173, 179]
        assert rows[0].half == 5268.0 / 2

    def test_star(self, tables):
        df = run(tables, "SELECT * FROM poly")
        assert df.columns == ["fid", "eas_id", "prfedea", "area"]
        assert df.count() == 10

    def test_like_is_case_insensitive(self, tables):
        n = run(
            tables,
            "SELECT name FROM idlink WHERE name LIKE 'n16%'",
        ).count()
        assert n == 4  # lowercase pattern still matches: OGR LIKE = ILIKE

    def test_in_between_null_not(self, tables):
        rows = run(
            tables,
            "SELECT eas_id FROM poly WHERE eas_id IN (158, 165, 179) "
            "AND eas_id BETWEEN 150 AND 170 AND prfedea IS NOT NULL "
            "ORDER BY eas_id",
        ).collect()
        assert [r.eas_id for r in rows] == [158, 165]

    def test_order_limit_offset(self, tables):
        rows = run(
            tables,
            "SELECT eas_id FROM poly ORDER BY eas_id DESC LIMIT 3 OFFSET 2",
        ).collect()
        assert [r.eas_id for r in rows] == [172, 171, 170]

    def test_distinct(self, tables):
        assert run(
            tables,
            "SELECT DISTINCT CAST(eas_id / 10 AS integer) AS decade "
            "FROM poly",
        ).count() == 3

    def test_cast_and_funcs(self, tables):
        r = run(
            tables,
            "SELECT CONCAT(prfedea, ':', name) AS tag, "
            "SUBSTR(prfedea, 5, 2) AS tail, eas_id "
            "FROM poly JOIN idlink ON poly.eas_id = idlink.eas_id "
            "ORDER BY eas_id LIMIT 1",
        ).collect()[0]
        assert r.eas_id == 158 and r.tag.endswith(":N158")
        assert len(r.tail) == 2


class TestSummary:
    def test_aggregates(self, tables):
        r = run(
            tables,
            "SELECT COUNT(*) AS n, MIN(eas_id) AS lo, MAX(eas_id) AS hi, "
            "SUM(eas_id) AS s, COUNT(DISTINCT eas_id) AS nd FROM poly",
        ).collect()
        assert len(r) == 1
        assert (r[0].n, r[0].lo, r[0].hi, r[0].nd) == (10, 158, 179, 10)

    def test_cannot_mix_fields_and_aggs(self, tables):
        with pytest.raises(ValueError, match="mix"):
            run(tables, "SELECT eas_id, COUNT(*) FROM poly")


class TestJoin:
    def test_first_match_left_join_row_count(self, tables):
        # ogr_join_test.py test_ogr_join_1: exactly one row per primary
        df = run(
            tables,
            "SELECT * FROM poly LEFT JOIN idlink "
            "ON poly.eas_id = idlink.eas_id",
        )
        assert df.count() == 10

    def test_unmatched_primary_gets_nulls(self, tables):
        rows = run(
            tables,
            "SELECT eas_id, name FROM poly LEFT JOIN idlink "
            "ON poly.eas_id = idlink.eas_id ORDER BY eas_id DESC LIMIT 2",
        ).collect()
        assert rows[0].eas_id == 179
        assert rows[0].name is None

    def test_joined_field_rejected_in_where(self, tables):
        with pytest.raises(ValueError, match="not allowed"):
            run(
                tables,
                "SELECT eas_id FROM poly LEFT JOIN idlink "
                "ON poly.eas_id = idlink.eas_id WHERE name = '_158_'",
            )


class TestUnion:
    def test_union_all(self, tables):
        df = run(
            tables,
            "SELECT eas_id AS v FROM poly WHERE eas_id < 166 "
            "UNION ALL SELECT eas_id AS v FROM idlink WHERE eas_id > 169",
        )
        assert df.count() == 2 + 2


class TestSpecialFields:
    def test_fid_resolves_to_row_id(self, tables):
        rows = run(
            tables,
            "SELECT FID AS f, eas_id FROM poly WHERE FID < 3 ORDER BY f",
        ).collect()
        assert [r.f for r in rows] == [0, 1, 2]

    def test_ogr_geom_area(self, spark):
        from gdal_spark import wkb as wkb_mod

        sqring = np.array(
            [[0, 0], [3, 0], [3, 3], [0, 3], [0, 0]], dtype=float
        )
        t = spark.createDataFrame(
            pd.DataFrame(
                {"gid": [1], "geom_wkb": [wkb_mod.polygon([sqring])]}
            )
        )
        r = run(
            {"geoms": t},
            "SELECT gid, OGR_GEOM_AREA AS a FROM geoms "
            "WHERE OGR_GEOM_AREA > 5",
        ).collect()
        assert len(r) == 1 and r[0].a == 9.0

    def test_star_except_exclusion(self, tables):
        df = run(tables, "SELECT * EXCEPT (prfedea, area) FROM poly")
        assert df.columns == ["fid", "eas_id"]
        df = run(tables, "SELECT * EXCLUDE (fid) FROM poly LIMIT 2")
        assert df.columns == ["eas_id", "prfedea", "area"]
        assert df.count() == 2
