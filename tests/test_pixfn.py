"""VRT pixel functions (gdal_spark/pixfn.py): parser, numpy/Column/SQL
backend parity, builtin registry, distributed derived tiles."""

import math

import duckdb
import numpy as np
import pytest

from gdal_spark import pixfn
from gdal_spark.pixfn import (
    PixfnSyntaxError,
    builtin,
    compile_column,
    compile_numpy,
    derived_tiles,
    parse,
    to_sql,
    variables,
)

A = np.array([1.0, 4.0, 9.0, 16.0, 2.5, 100.0])
B = np.array([2.0, 2.0, 3.0, 4.0, 0.5, 10.0])


# ---------------------------------------------------------------- parser

def test_precedence_and_unary():
    f = compile_numpy("-A + B * 2 ^ 2")
    assert np.allclose(f({"A": A, "B": B}), -A + B * 4.0)


def test_power_right_assoc():
    f = compile_numpy("2 ^ 3 ^ 2")  # 2^(3^2) = 512, muparser-style
    assert f({})[()] == 512.0


def test_parens_and_functions():
    f = compile_numpy("sqrt(A) * (B + 1)")
    assert np.allclose(f({"A": A, "B": B}), np.sqrt(A) * (B + 1))


def test_comparison_yields_01():
    f = compile_numpy("A > B")
    assert np.array_equal(f({"A": A, "B": B}), (A > B).astype(float))


def test_if_and_clip():
    f = compile_numpy("if(A > 5, A, B)")
    assert np.allclose(f({"A": A, "B": B}), np.where(A > 5, A, B))
    g = compile_numpy("clip(A, 2, 10)")
    assert np.allclose(g({"A": A}), np.clip(A, 2, 10))


def test_variables_order():
    assert variables(parse("B2 + sqrt(B1) * B2 - C")) == ["B2", "B1", "C"]


def test_syntax_errors():
    for bad in ("A +", "foo(A)", "(A", "A @ B", "1..2"):
        with pytest.raises(PixfnSyntaxError):
            parse(bad)


def test_pi_constant():
    assert compile_numpy("cos(pi)")({})[()] == pytest.approx(-1.0)


# ------------------------------------------------------------- builtins

def test_builtin_expressions():
    cases = {
        ("sum", 3): lambda b: b[0] + b[1] + b[2],
        ("diff", 2): lambda b: b[0] - b[1],
        ("mul", 2): lambda b: b[0] * b[1],
        ("div", 2): lambda b: b[0] / b[1],
        ("min", 2): lambda b: np.minimum(b[0], b[1]),
        ("max", 2): lambda b: np.maximum(b[0], b[1]),
        ("mean", 2): lambda b: (b[0] + b[1]) / 2.0,
        ("norm_diff", 2): lambda b: (b[0] - b[1]) / (b[0] + b[1]),
        ("inv", 1): lambda b: 1.0 / b[0],
        ("sqrt", 1): lambda b: np.sqrt(b[0]),
        ("log10", 1): lambda b: np.log10(np.abs(b[0])),
        ("dB", 1): lambda b: 20.0 * np.log10(np.abs(b[0])),
    }
    bands = {"B1": A, "B2": B, "B3": A + B}
    for (name, n), expect in cases.items():
        f = compile_numpy(builtin(name, n))
        got = f(bands)
        assert np.allclose(
            got, expect([A, B, A + B])
        ), name


def test_builtin_exp_scale_interp():
    f = compile_numpy(builtin("exp", 1, base=10.0, fact=0.05))
    assert np.allclose(f({"B1": A}), 10.0 ** (0.05 * A))
    g = compile_numpy(builtin("scale", 1, offset=3.0, scale=0.5))
    assert np.allclose(g({"B1": A}), A * 0.5 + 3.0)
    h = compile_numpy(builtin("interpolate_linear", 2, t=0.25))
    assert np.allclose(h({"B1": A, "B2": B}), A + 0.25 * (B - A))


# ------------------------------------------- three-backend value parity

PARITY_EXPRS = [
    "A * 2 + B",
    "(A - B) / (A + B)",
    "sqrt(A) + log10(B)",
    "if(A >= 9, clip(B, 1, 3), -B)",
    "min(A, B) + max(A, B, 5)",
    "pow(B, 2) - A % 3",
    "avg(A, B, 4)",
]


@pytest.mark.parametrize("expr", PARITY_EXPRS)
def test_numpy_vs_duckdb_sql(expr):
    f = compile_numpy(expr)
    want = f({"A": A, "B": B})
    import pandas as pd

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"A": A, "B": B}))
    got = np.array(
        [r[0] for r in con.execute(
            f"SELECT {to_sql(expr)} FROM t"
        ).fetchall()]
    )
    assert np.allclose(got, want, rtol=0, atol=1e-12), expr


@pytest.mark.parametrize("expr", PARITY_EXPRS)
def test_numpy_vs_spark_column(spark, expr):
    import pandas as pd

    f = compile_numpy(expr)
    want = f({"A": A, "B": B})
    df = spark.createDataFrame(pd.DataFrame({"A": A, "B": B}))
    got = np.array(
        [r["v"] for r in
         df.select(compile_column(expr).alias("v")).collect()]
    )
    assert np.allclose(got, want, rtol=0, atol=1e-12), expr


# ------------------------------------------------- distributed derived

def _inverted(df):
    """255 - band, as a second co-registered deterministic band."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["data"] = pdf["data"].map(
                lambda b: bytes(255 - np.frombuffer(b, np.uint8))
            )
            yield pdf

    return df.mapInPandas(run, df.schema)


def test_derived_tiles_ndvi_like(spark):
    from gdal_spark.operators.tiling import formula_tiles

    red = formula_tiles(spark, 2, 2, 32)
    nir = _inverted(formula_tiles(spark, 2, 2, 32))
    out = derived_tiles(
        {"A": red, "B": nir}, "(A - B) / (A + B + 1)"
    ).collect()
    assert len(out) == 4
    from gdal_spark.raster import formula_block

    by_key = {(r["tx"], r["ty"]): r for r in out}
    for (tx, ty), r in by_key.items():
        a = formula_block(tx * 32, ty * 32, 32, 32).astype(np.float64)
        b = 255.0 - a
        want = (a - b) / (a + b + 1)
        got = np.frombuffer(r["data"], dtype=np.float64).reshape(32, 32)
        assert np.allclose(got, want)


def test_derived_tiles_missing_band_raises(spark):
    from gdal_spark.operators.tiling import formula_tiles

    a = formula_tiles(spark, 1, 1, 16)
    b = formula_tiles(spark, 2, 1, 16)  # extra tile has no A
    with pytest.raises(Exception):
        derived_tiles({"A": a, "B": b}, "A + B").collect()
