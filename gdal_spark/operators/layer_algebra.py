"""Layer algebra with geometric output (polygon × polygon).

Spark re-expression of the reference's layer-algebra family —
OGRLayer::Intersection (ogr/ogrlayer.cpp:3345), Union (:3763),
SymDifference (:4300), Identity (:4730), Update (:5148), Clip (:5497),
Erase (:5806); semantics corpus autotest/ogr/ogr_layer_algebra.py.

The reference runs a nested loop with per-feature spatial-index
pushdown and hands each surviving pair to GEOS. Here the big side (A)
is a DataFrame, the method side (B) a small broadcast polygon set
(the STRtree-broadcast pattern of the spatial join); the geometric
residues come from two numpy kernels:

* ``geometry.clip_poly_convex``   — A ∩ B (Sutherland-Hodgman),
* ``geometry.split_poly_convex``  — exact disjoint decomposition of
  A \\ B (per-half-plane residue pieces),

so every mode emits REAL result geometries (WKB), not just row
semantics. Concave method polygons are handled by ear-clipping them
into disjoint triangles at broadcast build (geometry.ear_triangulate):
piece areas then sum exactly for every mode; convex rings keep the
single-clip fast path.

Scale: A never collects; per-pair work is bbox-prefiltered against the
broadcast B set (envelope pretest, ogrlayer.cpp:3427). The flipped
residue (B \\ all A) groups candidate A rings per b_id — the only
stage whose per-task memory is O(candidate A's per B), the same
locality assumption as the reference's per-feature filter pushdown.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import geometry, wkb

PIECE_SCHEMA = "a_id long, b_id long, piece_wkb binary, area double"


def _b_rings(b_pdf: pd.DataFrame, id_col: str = "poly_id"):
    """Decode the broadcast side once: [(b_id, open_ring, bbox)]."""
    out = []
    for pid, buf in zip(b_pdf[id_col], b_pdf["geom_wkb"]):
        ring = wkb.polygon_rings(bytes(buf))[0][0]
        opened = geometry._open_ring(ring)
        bb = geometry.ring_bbox(opened)
        out.append((int(pid), opened, bb))
    return out


def _b_pieces(b_pdf: pd.DataFrame, id_col: str = "poly_id"):
    """Broadcast side as CONVEX clip pieces: a convex ring stays one
    piece; a concave ring ear-triangulates into disjoint triangles
    (exact piece-sum algebra either way)."""
    out = []
    for pid, ring, bb in _b_rings(b_pdf, id_col):
        if geometry.ring_is_convex(ring):
            pieces = [ring]
        else:
            pieces = geometry.ear_triangulate(ring)
        out.append((pid, pieces, bb))
    return out


def _subject_parts(buf: bytes):
    """Decode a (multi)polygon WKB into [(outer_ring, [hole_rings])]
    open-ring parts — the full subject geometry, not just the first
    outer ring."""
    out = []
    for part in wkb.polygon_rings(bytes(buf)):
        outer = geometry._open_ring(part[0])
        holes = [geometry._open_ring(h) for h in part[1:]]
        out.append((outer, holes))
    return out


def _clip_part(outer, holes, clip_pieces):
    """(outer − holes) ∩ clip_pieces as disjoint piece rings: clip the
    outer by each convex piece, then subtract the holes from every
    resulting piece (holes lie inside the outer, so piece-wise
    subtraction stays exact)."""
    pieces = []
    for cp in clip_pieces:
        p = geometry.clip_poly_convex(outer, cp)
        if len(p) < 3:
            continue
        if holes:
            pieces.extend(geometry.erase_poly_simple(p, holes))
        else:
            pieces.append(p)
    return pieces


def _piece_rows(a_id, b_id, pieces):
    rows = []
    for p in pieces:
        if len(p) < 3:
            continue
        area = abs(geometry.ring_area(np.vstack([p, p[:1]])))
        rows.append(
            (a_id, b_id, wkb.polygon([np.vstack([p, p[:1]])]), area)
        )
    return rows


def intersection_pieces(
    a_df: DataFrame,
    b_pdf: pd.DataFrame,
    id_col: str = "a_id",
    b_id_col: str = "poly_id",
    min_area: float = 0.0,
) -> DataFrame:
    """A ∩ B per overlapping pair → (a_id, b_id, piece_wkb, area).

    OGRLayer::Intersection / Clip geometry path (Clip keeps only A's
    attributes — same rows, caller drops b_id). Concave B rings
    ear-triangulate at broadcast build: a pair's intersection then
    emits one row per disjoint piece (areas sum exactly)."""
    spark = a_df.sparkSession
    brc = spark.sparkContext.broadcast(_b_pieces(b_pdf, b_id_col))

    def run(batches):
        bset = brc.value
        for pdf in batches:
            rows = []
            for aid, buf in zip(pdf[id_col], pdf["geom_wkb"]):
                for outer, holes in _subject_parts(buf):
                    ax0, ay0, ax1, ay1 = geometry.ring_bbox(outer)
                    for bid, bpieces, (bx0, by0, bx1, by1) in bset:
                        if (bx1 < ax0 or bx0 > ax1
                                or by1 < ay0 or by0 > ay1):
                            continue  # envelope pretest (:3427)
                        inters = _clip_part(outer, holes, bpieces)
                        for row in _piece_rows(int(aid), bid, inters):
                            if row[3] > min_area:
                                rows.append(row)
            yield pd.DataFrame(
                rows, columns=["a_id", "b_id", "piece_wkb", "area"]
            )

    return a_df.select(id_col, "geom_wkb").mapInPandas(run, PIECE_SCHEMA)


def erase_pieces(
    a_df: DataFrame,
    b_pdf: pd.DataFrame,
    id_col: str = "a_id",
    b_id_col: str = "poly_id",
) -> DataFrame:
    """A \\ union(B) as disjoint pieces → (a_id, b_id = -1, piece_wkb,
    area). Correct for overlapping AND concave B's (clips decompose to
    convex pieces; sequential subtraction keeps the piece set
    disjoint). OGRLayer::Erase geometry path."""
    spark = a_df.sparkSession
    brc = spark.sparkContext.broadcast(_b_pieces(b_pdf, b_id_col))

    def run(batches):
        bset = brc.value
        for pdf in batches:
            rows = []
            for aid, buf in zip(pdf[id_col], pdf["geom_wkb"]):
                for outer, holes in _subject_parts(buf):
                    ax0, ay0, ax1, ay1 = geometry.ring_bbox(outer)
                    clips = [
                        bp
                        for _, bpieces, (bx0, by0, bx1, by1) in bset
                        if not (bx1 < ax0 or bx0 > ax1
                                or by1 < ay0 or by0 > ay1)
                        for bp in bpieces
                    ]
                    # subject holes subtract exactly like clips
                    pieces = geometry.erase_poly_simple(
                        outer, holes + clips
                    ) if holes else geometry.erase_poly_convex(
                        outer, clips
                    )
                    rows.extend(_piece_rows(int(aid), -1, pieces))
            yield pd.DataFrame(
                rows, columns=["a_id", "b_id", "piece_wkb", "area"]
            )

    return a_df.select(id_col, "geom_wkb").mapInPandas(run, PIECE_SCHEMA)


def erase_b_pieces(
    a_df: DataFrame,
    b_pdf: pd.DataFrame,
    id_col: str = "a_id",
    b_id_col: str = "poly_id",
) -> DataFrame:
    """B \\ union(A) as disjoint pieces → (a_id = -1, b_id, piece_wkb,
    area) — the flipped residue needed by Union/SymDifference.

    Distribution: each A row emits (b_id, its ring) for every B whose
    bbox it meets; a groupBy(b_id) task subtracts that B's candidate
    A's sequentially. A's ring ships only to the B's it can affect."""
    spark = a_df.sparkSession
    bset = _b_rings(b_pdf, b_id_col)
    brc = spark.sparkContext.broadcast(bset)

    def emit(batches):
        bs = brc.value
        for pdf in batches:
            rows = []
            for buf in pdf["geom_wkb"]:
                for outer, holes in _subject_parts(buf):
                    # holed part → disjoint SIMPLE pieces, so the
                    # flipped subtraction never erases hole interiors
                    pieces = (
                        geometry.erase_poly_simple(outer, holes)
                        if holes else [outer]
                    )
                    for ring in pieces:
                        ax0, ay0, ax1, ay1 = geometry.ring_bbox(ring)
                        for bid, _, (bx0, by0, bx1, by1) in bs:
                            if (bx1 < ax0 or bx0 > ax1
                                    or by1 < ay0 or by0 > ay1):
                                continue
                            rows.append(
                                (bid, np.ascontiguousarray(ring).tobytes())
                            )
            yield pd.DataFrame(rows, columns=["b_id", "a_ring"])

    cands = a_df.select("geom_wkb").mapInPandas(
        emit, "b_id long, a_ring binary"
    )
    ring_by_bid = {bid: bring for bid, bring, _ in bset}

    def subtract(pdf: pd.DataFrame) -> pd.DataFrame:
        bid = int(pdf["b_id"].iloc[0])
        clips = [
            np.frombuffer(rb, dtype=np.float64).reshape(-1, 2)
            for rb in pdf["a_ring"]
        ]
        # erase_poly_simple: concave A rings decompose to triangles
        pieces = geometry.erase_poly_simple(ring_by_bid[bid], clips)
        return pd.DataFrame(
            _piece_rows(-1, bid, pieces),
            columns=["a_id", "b_id", "piece_wkb", "area"],
        )

    touched = cands.groupBy("b_id").applyInPandas(subtract, PIECE_SCHEMA)
    # B's untouched by any A pass through whole
    touched_ids = {
        int(r.b_id) for r in cands.select("b_id").distinct().collect()
    }
    whole = [
        (-1, bid, wkb.polygon([np.vstack([r, r[:1]])]),
         abs(geometry.ring_area(np.vstack([r, r[:1]]))))
        for bid, r, _ in bset
        if bid not in touched_ids
    ]
    if whole:
        whole_df = spark.createDataFrame(
            pd.DataFrame(
                whole, columns=["a_id", "b_id", "piece_wkb", "area"]
            )
        )
        touched = touched.unionByName(whole_df)
    return touched


def identity_pieces(a_df, b_pdf, **kw) -> DataFrame:
    """Identity(A, B): A split by B — A∩B pieces plus A\\B pieces
    (ogr/ogrlayer.cpp:4730)."""
    return intersection_pieces(a_df, b_pdf, **kw).unionByName(
        erase_pieces(a_df, b_pdf, **kw)
    )


def union_pieces(a_df, b_pdf, **kw) -> DataFrame:
    """Union(A, B): A∩B + A\\B + B\\A pieces (ogr/ogrlayer.cpp:3763)."""
    return identity_pieces(a_df, b_pdf, **kw).unionByName(
        erase_b_pieces(a_df, b_pdf, **kw)
    )


def sym_difference_pieces(a_df, b_pdf, **kw) -> DataFrame:
    """SymDifference(A, B): A\\B + B\\A pieces (ogr/ogrlayer.cpp:4300)."""
    return erase_pieces(a_df, b_pdf, **kw).unionByName(
        erase_b_pieces(a_df, b_pdf, **kw)
    )


def update_pieces(a_df, b_pdf, **kw) -> DataFrame:
    """Update(A, B): A\\B pieces plus B originals (ogr/ogrlayer.cpp
    :5148)."""
    spark = a_df.sparkSession
    b_id_col = kw.get("b_id_col", "poly_id")
    rows = []
    for bid, ring, _ in _b_rings(b_pdf, b_id_col):
        closed = np.vstack([ring, ring[:1]])
        rows.append(
            (-1, bid, wkb.polygon([closed]),
             abs(geometry.ring_area(closed)))
        )
    b_df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["a_id", "b_id", "piece_wkb", "area"])
    )
    return erase_pieces(a_df, b_pdf, **kw).unionByName(b_df)


def predicate_pairs(
    a_df: DataFrame,
    b_pdf: pd.DataFrame,
    id_col: str = "a_id",
    b_id_col: str = "poly_id",
) -> DataFrame:
    """ST predicate matrix per bbox-overlapping (A, B) pair →
    (a_id, b_id, intersects, .., crosses) as 0/1 longs — the
    polygon×polygon half of the SQLite-dialect predicate registry
    (ogr/ogrsqlitesqlfunctions.cpp:876-883)."""
    spark = a_df.sparkSession
    brc = spark.sparkContext.broadcast(_b_rings(b_pdf, b_id_col))
    preds = geometry._PREDICATES
    # st_ prefix: bare names like "within"/"contains" collide with SQL
    # keywords in the oracle dialect
    cols = [f"st_{p}" for p in preds]
    schema = "a_id long, b_id long, " + ", ".join(
        f"{c} long" for c in cols
    )

    def run(batches):
        bset = brc.value
        for pdf in batches:
            rows = []
            for aid, buf in zip(pdf[id_col], pdf["geom_wkb"]):
                ring = geometry._open_ring(
                    wkb.polygon_rings(bytes(buf))[0][0]
                )
                for bid, bring, _ in bset:
                    d = geometry.polygon_pair_predicates(ring, bring)
                    rows.append(
                        (int(aid), bid, *[int(d[p]) for p in preds])
                    )
            yield pd.DataFrame(
                rows, columns=["a_id", "b_id", *cols]
            )

    return a_df.select(id_col, "geom_wkb").mapInPandas(run, schema)
