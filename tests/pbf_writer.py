"""Minimal OSM PBF writer for tests: builds tiny synthetic extracts so the
native reader can be validated without a real planet file."""

from __future__ import annotations

import struct
import zlib


def _varint(x: int) -> bytes:
    out = b""
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def _zigzag(x: int) -> int:
    return (x << 1) ^ (x >> 63)


def _field(num: int, wire: int, payload) -> bytes:
    tag = _varint((num << 3) | wire)
    if wire == 0:
        return tag + _varint(payload)
    return tag + _varint(len(payload)) + payload


def _packed(values) -> bytes:
    return b"".join(_varint(v) for v in values)


def _primitive_block(nodes, ways) -> bytes:
    """One PrimitiveBlock: a DenseNodes group + one group per way."""
    strings = [b""]
    s_idx = {b"": 0}

    def intern(s: str) -> int:
        b = s.encode()
        if b not in s_idx:
            s_idx[b] = len(strings)
            strings.append(b)
        return s_idx[b]

    groups = []
    if nodes:
        # DenseNodes (delta coded, granularity default 100 -> lat=1e-9*100*v)
        ids, lats, lons, kvs = [], [], [], []
        prev = (0, 0, 0)
        for nid, lat, lon, tags in nodes:
            ilat, ilon = round(lat * 1e7), round(lon * 1e7)
            ids.append(_zigzag(nid - prev[0]))
            lats.append(_zigzag(ilat - prev[1]))
            lons.append(_zigzag(ilon - prev[2]))
            prev = (nid, ilat, ilon)
            for k, v in tags.items():
                kvs.append(intern(k))
                kvs.append(intern(v))
            kvs.append(0)
        dense = (
            _field(1, 2, _packed(ids))
            + _field(8, 2, _packed(lats))
            + _field(9, 2, _packed(lons))
            + _field(10, 2, _packed(kvs))
        )
        groups.append(_field(2, 2, dense))

    for wid, refs, tags in ways:
        keys = _packed([intern(k) for k in tags])
        vals = _packed([intern(v) for v in tags.values()])
        deltas = []
        prev_ref = 0
        for r in refs:
            deltas.append(_zigzag(r - prev_ref))
            prev_ref = r
        way = (
            _field(1, 0, wid)
            + _field(2, 2, keys)
            + _field(3, 2, vals)
            + _field(8, 2, _packed(deltas))
        )
        groups.append(_field(3, 2, way))

    stringtable = b"".join(_field(1, 2, s) for s in strings)
    return _field(1, 2, stringtable) + b"".join(
        _field(2, 2, g) for g in groups
    )


def _blob(type_name: bytes, block: bytes, compress: bool) -> bytes:
    if compress:
        z = zlib.compress(block)
        blob = _field(2, 0, len(block)) + _field(3, 2, z)
    else:
        blob = _field(1, 2, block)
    header = _field(1, 2, type_name) + _field(3, 0, len(blob))
    return struct.pack(">I", len(header)) + header + blob


def _header_block() -> bytes:
    """HeaderBlock with the required_features (4) every real extract
    carries — readers must skip the OSMHeader blob, not choke on it."""
    return (
        _field(4, 2, b"OsmSchema-V0.6")
        + _field(4, 2, b"DenseNodes")
        + _field(16, 2, b"esucd-fixture-writer")
    )


def build_pbf(nodes, ways, compress=True, max_entities=None,
              with_header=False) -> bytes:
    """nodes: [(id, lat, lon, {tags})]; ways: [(id, [refs], {tags})].

    Default: one OSMData blob holding everything (the minimal shape the
    unit tests use).  Real-encoding shape (``with_header=True,
    max_entities=8000``): a leading OSMHeader blob, then multiple OSMData
    blobs with <= max_entities primitives per block — the structure of
    actual planet extracts (osmpbf splits at 8,000 entities/group)."""
    out = b""
    if with_header:
        out += _blob(b"OSMHeader", _header_block(), compress)
    if max_entities is None:
        return out + _blob(
            b"OSMData", _primitive_block(nodes, ways), compress
        )
    chunks = []
    for i in range(0, len(nodes), max_entities):
        chunks.append((nodes[i : i + max_entities], []))
    for i in range(0, len(ways), max_entities):
        chunks.append(([], ways[i : i + max_entities]))
    if not chunks:
        chunks = [([], [])]
    for ns, ws in chunks:
        out += _blob(b"OSMData", _primitive_block(ns, ws), compress)
    return out
