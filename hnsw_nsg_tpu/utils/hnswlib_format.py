"""Byte-compatible reader/writer for hnswlib's binary index format.

Format (hnswlib/hnswlib/hnswalg.h:685-713 saveIndex, loadIndex :716-822):
header PODs (size_t offsetLevel0, max_elements, cur_element_count,
size_data_per_element, label_offset, offsetData; int32 maxlevel; uint32
enterpoint; size_t maxM, maxM0, M; double mult; size_t ef_construction),
then the level-0 arena (per node: [uint16 link_count, uint16 flags,
maxM0 x uint32 ids], vector f32 payload, uint64 label), then per node a
uint32 linkListSize followed by that many bytes of upper-level link blocks
([uint16 count, uint16 pad, maxM x uint32] per level).

The deleted mark is bit 0 of the flags uint16 (DELETE_MARK, hnswalg.h delete
machinery :853-937). dim is derived from the arena stride, so indices built
by the reference load without extra metadata.
"""

from __future__ import annotations

import struct

import numpy as np

PAD_ID = -1
_HEADER = struct.Struct("<QQQQQQiIQQQdQ")


def read_hnswlib_index(path: str):
    """-> dict with data [n, dim] f32, labels [n] i64, levels [n] i32,
    adj0 [n, maxM0] i32 (PAD_ID padded), adj_up list of [n, maxM] i32,
    deleted [n] bool, plus meta (M, maxM0, ef_construction, mult,
    enterpoint, maxlevel, max_elements)."""
    with open(path, "rb") as f:
        hdr = f.read(_HEADER.size)
        (offset_level0, max_elements, n, stride, label_off, data_off,
         maxlevel, enterpoint, max_m, max_m0, m, mult, efc) = \
            _HEADER.unpack(hdr)
        arena = np.frombuffer(f.read(n * stride), dtype=np.uint8)
        arena = arena.reshape(n, stride)

        dim = (label_off - data_off) // 4
        counts = arena[:, 0:2].copy().view(np.uint16)[:, 0]
        flags = arena[:, 2:4].copy().view(np.uint16)[:, 0]
        links = arena[:, 4 : 4 + max_m0 * 4].copy().view(np.uint32).reshape(
            n, max_m0
        )
        data = arena[:, data_off : data_off + dim * 4].copy().view(
            np.float32
        ).reshape(n, dim)
        labels = arena[:, label_off : label_off + 8].copy().view(
            np.int64
        )[:, 0]

        adj0 = np.where(
            np.arange(max_m0)[None, :] < counts[:, None],
            links.astype(np.int64), PAD_ID,
        ).astype(np.int32)
        deleted = (flags & 1).astype(bool)

        size_links_per = max_m * 4 + 4
        levels = np.zeros(n, np.int32)
        upper = {}
        for i in range(n):
            (lls,) = struct.unpack("<I", f.read(4))
            if lls == 0:
                continue
            lvl = lls // size_links_per
            levels[i] = lvl
            blob = np.frombuffer(f.read(lls), dtype=np.uint8).reshape(
                lvl, size_links_per
            )
            cnts = blob[:, 0:2].copy().view(np.uint16)[:, 0]
            ids = blob[:, 4:].copy().view(np.uint32).reshape(lvl, max_m)
            for l in range(lvl):
                row = np.where(
                    np.arange(max_m) < cnts[l], ids[l].astype(np.int64),
                    PAD_ID,
                ).astype(np.int32)
                upper.setdefault(l + 1, {})[i] = row

    n_levels = max(upper.keys(), default=0)
    adj_up = []
    for l in range(1, n_levels + 1):
        a = np.full((n, max_m), PAD_ID, np.int32)
        for i, row in upper.get(l, {}).items():
            a[i] = row
        adj_up.append(a)

    return {
        "data": data, "labels": labels, "levels": levels, "adj0": adj0,
        "adj_up": adj_up, "deleted": deleted,
        "M": m, "maxM": max_m, "maxM0": max_m0, "ef_construction": efc,
        "mult": mult, "enterpoint": enterpoint, "maxlevel": maxlevel,
        "max_elements": max_elements,
    }


def write_hnswlib_index(
    path: str, data, labels, levels, adj0, adj_up, deleted,
    m: int, ef_construction: int, enterpoint: int, maxlevel: int,
    mult: float | None = None,
):
    """Write an index loadable by the reference's loadIndex."""
    data = np.ascontiguousarray(data, np.float32)
    n, dim = data.shape
    max_m, max_m0 = m, 2 * m
    if mult is None:
        mult = 1.0 / np.log(max(m, 2))
    size_links0 = 4 + max_m0 * 4
    data_off = size_links0
    label_off = data_off + dim * 4
    stride = label_off + 8
    size_links_per = max_m * 4 + 4

    arena = np.zeros((n, stride), np.uint8)
    adj0 = np.asarray(adj0)[:, :max_m0]
    counts = (adj0 >= 0).sum(axis=1).astype(np.uint16)
    flags = np.where(np.asarray(deleted), 1, 0).astype(np.uint16)
    arena[:, 0:2] = counts[:, None].view(np.uint8).reshape(n, 2)
    arena[:, 2:4] = flags[:, None].view(np.uint8).reshape(n, 2)
    links = np.where(adj0 >= 0, adj0, 0).astype(np.uint32)
    if adj0.shape[1] < max_m0:
        links = np.pad(links, ((0, 0), (0, max_m0 - adj0.shape[1])))
    arena[:, 4 : 4 + max_m0 * 4] = links.view(np.uint8).reshape(n, -1)
    arena[:, data_off : data_off + dim * 4] = data.view(np.uint8).reshape(
        n, -1
    )
    arena[:, label_off:] = np.asarray(labels, np.int64)[:, None].view(
        np.uint8
    ).reshape(n, 8)

    with open(path, "wb") as f:
        f.write(_HEADER.pack(
            0, n, n, stride, label_off, data_off,
            int(maxlevel), int(enterpoint),
            max_m, max_m0, m, float(mult), ef_construction,
        ))
        f.write(arena.tobytes())
        levels = np.asarray(levels)
        for i in range(n):
            lvl = int(levels[i])
            if lvl <= 0:
                f.write(struct.pack("<I", 0))
                continue
            f.write(struct.pack("<I", size_links_per * lvl))
            for l in range(1, lvl + 1):
                row = (np.asarray(adj_up[l - 1][i])[:max_m]
                       if l - 1 < len(adj_up)
                       else np.full(max_m, PAD_ID, np.int32))
                cnt = int((row >= 0).sum())
                blob = np.zeros(size_links_per, np.uint8)
                blob[0:2] = np.array([cnt], np.uint16).view(np.uint8)
                ids = np.where(row >= 0, row, 0).astype(np.uint32)
                blob[4:] = ids.view(np.uint8)
                f.write(blob.tobytes())
