"""Summarize a jax.profiler .xplane.pb without tensorflow/tensorboard.

Minimal hand-rolled protobuf walker over the XSpace schema (field
numbers from tsl/profiler/protobuf/xplane.proto):
  XSpace.planes=1 ; XPlane{id=1,name=2,lines=3,event_metadata=11}
  XLine{name=2,events=6} ; XEvent{metadata_id=1,duration_ps=3}
  XEventMetadata map entry {key=1,value=2}; XEventMetadata{id=1,name=2}

Usage: python benchmarks/xplane_summary.py <file.xplane.pb> [top_n]
"""
import struct
import sys


def read_varint(buf, i):
    result = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = read_varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = read_varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    buf = open(path, "rb").read()
    for fn, wt, plane in fields(buf):
        if fn != 1:
            continue
        name = ""
        ev_names = {}
        line_bufs = []
        for pfn, pwt, pv in fields(plane):
            if pfn == 2 and pwt == 2:
                name = pv.decode("utf-8", "replace")
            elif pfn == 3 and pwt == 2:
                line_bufs.append(pv)
            elif pfn in (4, 11) and pwt == 2:
                # event_metadata map entry: field 11 (tsl schema) or
                # field 4 (the jax 0.9 wheel's embedded schema)
                k = None
                mname = ""
                for efn, ewt, ev in fields(pv):
                    if efn == 1 and ewt == 0:
                        k = ev
                    elif efn == 2 and ewt == 2:
                        for mfn, mwt, mv in fields(ev):
                            if mfn == 1 and mwt == 0:
                                k = mv if k is None else k
                            elif mfn == 2 and mwt == 2:
                                mname = mv.decode("utf-8", "replace")
                if k is not None:
                    ev_names[k] = mname
        totals = {}
        counts = {}
        for lb in line_bufs:
            for lfn, lwt, lv in fields(lb):
                # XLine.events has been seen as field 6 (tsl schema) and
                # field 4 (the jax 0.9 wheel's embedded schema) — accept both
                if lfn not in (4, 6) or lwt != 2:
                    continue
                mid = dur = 0
                for efn, ewt, ev in fields(lv):
                    if efn == 1 and ewt == 0:
                        mid = ev
                    elif efn == 3 and ewt == 0:
                        dur = ev
                nm = ev_names.get(mid, f"#{mid}")
                totals[nm] = totals.get(nm, 0) + dur
                counts[nm] = counts.get(nm, 0) + 1
        if not totals:
            continue
        print(f"== plane: {name}  ({sum(totals.values())/1e9:.3f} ms total)")
        for nm, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {ps/1e9:10.3f} ms  x{counts[nm]:<5d} {nm[:100]}")


if __name__ == "__main__":
    main()
