"""Native OSM PBF reader + point-in-polygon assignment tests."""

import numpy as np
import pytest

from epidemicsimulator_tpu.data.osm.native import (
    CLASS_HOSPITAL,
    CLASS_HOUSEHOLD,
    CLASS_SCHOOL,
    CLASS_SHOP,
    CLASS_WORKPLACE,
    assign_points_to_polygons,
    parse_pbf,
)
from pbf_writer import build_pbf


@pytest.fixture()
def tiny_pbf(tmp_path):
    nodes = [
        (1, 53.00010, -1.00010, {}),
        (2, 53.00010, -1.00000, {}),
        (3, 53.00000, -1.00000, {}),
        (4, 53.00000, -1.00010, {}),
        (10, 53.1, -1.1, {"amenity": "school"}),
        (11, 53.2, -1.2, {"shop": "bakery"}),
        (12, 53.3, -1.3, {"amenity": "hospital"}),
        (13, 53.4, -1.4, {"building": "house"}),
        (14, 60.0, 10.0, {"shop": "excluded_by_bounds"}),
    ]
    ways = [
        (100, [1, 2, 3, 4, 1], {"building": "office"}),
        (101, [1, 2, 3, 4, 1], {"building": "residential"}),
        (102, [1, 2, 3, 4, 1], {"building": "weird_type"}),
    ]
    p = tmp_path / "tiny.osm.pbf"
    p.write_bytes(build_pbf(nodes, ways))
    return str(p)


def test_parse_pbf_classification(tiny_pbf):
    classes, lats, lons, areas = parse_pbf(
        tiny_pbf, bounds=(50.0, 56.0, -6.0, 2.0)
    )
    # 4 tagged nodes inside bounds + 3 ways
    assert len(classes) == 7
    assert (np.sort(classes[:4]) == [CLASS_SHOP, CLASS_SCHOOL, CLASS_HOSPITAL, CLASS_HOUSEHOLD]).all()
    way_classes = classes[4:]
    assert list(way_classes) == [CLASS_WORKPLACE, CLASS_HOUSEHOLD, CLASS_WORKPLACE]
    # way centroid lands inside the square
    assert abs(lats[4] - 53.00005) < 1e-4
    # footprint area ~ 11m x 6.6m rectangle at this latitude
    assert 40 < areas[4] < 120
    # node buildings have zero area
    assert areas[0] == 0.0


def test_parse_pbf_bounds_filter(tiny_pbf):
    classes, lats, lons, _ = parse_pbf(tiny_pbf, bounds=(50.0, 56.0, -6.0, 2.0))
    assert (lats < 56.0).all()


def test_parse_pbf_uncompressed(tmp_path):
    from pbf_writer import build_pbf

    p = tmp_path / "raw.osm.pbf"
    p.write_bytes(
        build_pbf([(1, 51.0, 0.5, {"building": "office"})], [], compress=False)
    )
    classes, lats, lons, areas = parse_pbf(str(p))
    assert len(classes) == 1 and classes[0] == CLASS_WORKPLACE
    assert abs(lats[0] - 51.0) < 1e-6 and abs(lons[0] - 0.5) < 1e-6


def test_assign_points_grid():
    rng = np.random.default_rng(0)
    # 10x10 grid of unit-square polygons
    rings = []
    starts = [0]
    for gy in range(10):
        for gx in range(10):
            rings.extend(
                [(gx, gy), (gx + 1, gy), (gx + 1, gy + 1), (gx, gy + 1)]
            )
            starts.append(len(rings))
    rings = np.array(rings, np.float64)
    starts = np.array(starts, np.int64)

    pts = rng.uniform(0.001, 9.999, (5000, 2))
    out = assign_points_to_polygons(pts[:, 0], pts[:, 1], rings, starts)
    want = np.floor(pts[:, 1]).astype(int) * 10 + np.floor(pts[:, 0]).astype(int)
    # points on cell boundaries are ambiguous; exclude near-boundary points
    frac = np.minimum(pts % 1.0, 1.0 - pts % 1.0).min(axis=1)
    ok = frac > 1e-6
    assert (out[ok] == want[ok]).all()
    # outside points
    out2 = assign_points_to_polygons(
        np.array([-5.0, 20.0]), np.array([0.5, 0.5]), rings, starts
    )
    assert (out2 == -1).all()


def test_parse_pbf_real_encoding_shape(tmp_path):
    """Real planet extracts lead with an OSMHeader blob and split primitives
    across many OSMData blobs (~8,000 entities per group, osmpbf's writer
    constant); way node-refs routinely point at nodes from EARLIER blobs.
    The reader must skip the header blob, keep its node store across blobs,
    and resolve cross-blob refs (osm_data/src/lib.rs:524-673 semantics)."""
    rng = np.random.default_rng(7)
    nodes, ways = [], []
    nid = 1
    for i in range(500):
        lat = 53.0 + rng.uniform(0, 0.05)
        lon = -1.0 - rng.uniform(0, 0.05)
        tags = {"building": "house"} if i % 7 == 0 else {}
        nodes.append((nid, lat, lon, tags))
        nid += 1
    # ways referencing nodes spread across the whole id range (and hence,
    # with max_entities=64, across different blobs than the way's own blob)
    for w in range(40):
        refs = [1 + (w * 97 + k * 13) % 500 for k in range(4)]
        ways.append((10_000 + w, refs + [refs[0]], {"building": "office"}))
    p = tmp_path / "multi.osm.pbf"
    p.write_bytes(build_pbf(nodes, ways, max_entities=64, with_header=True))

    classes, lats, lons, areas = parse_pbf(
        str(p), bounds=(50.0, 56.0, -6.0, 2.0)
    )
    n_house_nodes = sum(1 for i in range(500) if i % 7 == 0)
    assert len(classes) == n_house_nodes + 40
    assert (classes[:n_house_nodes] == CLASS_HOUSEHOLD).all()
    assert (classes[n_house_nodes:] == CLASS_WORKPLACE).all()
    # single-blob (no header) parse of the same data agrees exactly
    p2 = tmp_path / "single.osm.pbf"
    p2.write_bytes(build_pbf(nodes, ways))
    c2, la2, lo2, a2 = parse_pbf(str(p2), bounds=(50.0, 56.0, -6.0, 2.0))
    assert (classes == c2).all()
    np.testing.assert_allclose(lats, la2)
    np.testing.assert_allclose(lons, lo2)
    np.testing.assert_allclose(areas, a2)
