"""Minimal xplane.pb parser: aggregate device op durations by name.

The tensorboard profile plugin is incompatible with the installed TF, so we
decode the protobuf wire format directly (XSpace/XPlane/XLine/XEvent).
Usage: python tools/xplane_summary.py <trace.xplane.pb> [top_n]
"""

import struct
import sys
from collections import defaultdict


def _varint(buf, i):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse(path, top_n=40):
    space = open(path, "rb").read()
    for fn, _, plane in fields(space):
        if fn != 1:
            continue
        name = b""
        ev_meta = {}
        lines = []
        for pf, _, pv in fields(plane):
            if pf == 2:
                name = pv
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:
                # map entry: key=1 varint, value=2 XEventMetadata
                k = None
                meta_name = b""
                for mf, _, mv in fields(pv):
                    if mf == 1:
                        k = mv
                    elif mf == 2:
                        for ef, _, ev in fields(mv):
                            if ef == 2:
                                meta_name = ev
                ev_meta[k] = meta_name.decode(errors="replace")
        pname = name.decode(errors="replace")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        durs = defaultdict(int)
        counts = defaultdict(int)
        self_durs = defaultdict(int)
        for line in lines:
            # XLine: id=1, name=2, events=4 (XEvent: metadata_id=1,
            # offset_ps=2, duration_ps=3).  Events on one line are
            # well-nested by [start, end); exclusive self time = duration
            # minus directly nested children.
            events = []
            for lf, _, lv in fields(line):
                if lf == 4 and isinstance(lv, bytes):  # XEvent
                    mid = off = dur = 0
                    for ef, _, ev in fields(lv):
                        if ef == 1:
                            mid = ev
                        elif ef == 2:
                            off = ev
                        elif ef == 3:
                            dur = ev
                    nm = ev_meta.get(mid, f"meta{mid}")
                    events.append((off, off + dur, nm))
                    durs[nm] += dur
                    counts[nm] += 1
            events.sort(key=lambda e: (e[0], -e[1]))
            frames = []  # [end, name, child_total]
            for start, end, nm in events:
                while frames and frames[-1][0] <= start:
                    f = frames.pop()
                    self_durs[f[1]] += (f[0] - f[3]) - f[2]
                    if frames:
                        frames[-1][2] += f[0] - f[3]
                frames.append([end, nm, 0, start])
            while frames:
                f = frames.pop()
                self_durs[f[1]] += (f[0] - f[3]) - f[2]
                if frames:
                    frames[-1][2] += f[0] - f[3]
        total = sum(durs.values())
        if not total:
            continue
        stotal = sum(self_durs.values())
        print(f"\n=== plane: {pname}  self-total {stotal/1e12*1e3:.2f} ms ===")
        print(f"{'self':>10}  {'incl':>10}  {'count':>6}  name")
        for nm, d in sorted(self_durs.items(), key=lambda kv: -kv[1])[:top_n]:
            print(
                f"{d/1e12*1e3:8.2f} ms {durs[nm]/1e12*1e3:8.2f} ms"
                f"  x{counts[nm]:<6} {nm[:100]}"
            )


if __name__ == "__main__":
    parse(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
