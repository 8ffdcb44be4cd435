"""--py-files packaging: deterministic zip, importable contents."""

import os
import sys
import zipfile


def test_zip_builds_deterministic_and_importable(tmp_path):
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools"),
    )
    import make_pyfiles

    p1 = make_pyfiles.build(str(tmp_path / "a.zip"))
    p2 = make_pyfiles.build(str(tmp_path / "b.zip"))
    assert open(p1, "rb").read() == open(p2, "rb").read()

    names = zipfile.ZipFile(p1).namelist()
    assert "gdal_spark/__init__.py" in names
    assert "gdal_spark/operators/spatial_join.py" in names
    assert not any("test" in n.split("/")[0] for n in names)
    assert not any(n.endswith(".pyc") for n in names)

    # the zip itself must be importable (spark ships it to executors
    # and puts it on sys.path). Save and RESTORE the live module
    # objects: replacing them would break class identity for every
    # later test that pickles engine classes by reference.
    saved = {
        m: sys.modules[m]
        for m in list(sys.modules) if m.startswith("gdal_spark")
    }
    sys.path.insert(0, p1)
    try:
        for mod in saved:
            del sys.modules[mod]
        import gdal_spark.wkb as w

        assert w.__file__.startswith(p1)
        assert w.point(1.0, 2.0)
    finally:
        sys.path.remove(p1)
        for mod in list(sys.modules):
            if mod.startswith("gdal_spark"):
                del sys.modules[mod]
        sys.modules.update(saved)
