"""tools/profile_summary.py wire-format parser: round-trip a hand-encoded
minimal xplane protobuf (the tool is how step-time breakdowns are read on
this image, so its field-number assumptions deserve a pin)."""

import struct
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import profile_summary as ps


def _varint(x):
    out = b""
    while True:
        b = x & 0x7F
        x >>= 7
        out += bytes([b | (0x80 if x else 0)])
        if not x:
            return out


def _field(fn, wt, payload):
    key = _varint((fn << 3) | wt)
    if wt == 0:
        return key + _varint(payload)
    return key + _varint(len(payload)) + payload


def _xevent(mid, dur_ps, occ=1):
    return (_field(1, 0, mid) + _field(3, 0, dur_ps) + _field(5, 0, occ))


def _xline(events):
    return b"".join(_field(4, 2, e) for e in events)


def _event_meta(mid, name):
    inner = _field(1, 0, mid) + _field(2, 2, name.encode())
    return _field(1, 0, mid) + _field(2, 2, inner)  # map entry {key, value}


def _xplane(name, metas, lines):
    return (_field(2, 2, name.encode())
            + b"".join(_field(4, 2, m) for m in metas)
            + b"".join(_field(3, 2, l) for l in lines))


def test_parse_minimal_xspace(tmp_path, capsys):
    plane = _xplane(
        "/device:TPU:0",
        [_event_meta(7, "fusion.42"), _event_meta(9, "copy.1")],
        [_xline([_xevent(7, 3_000_000_000, 2), _xevent(9, 1_000_000_000)])],
    )
    space = _field(1, 2, plane)
    p = tmp_path / "x.xplane.pb"
    p.write_bytes(space)
    ps.summarize(str(p), top_n=5)
    out = capsys.readouterr().out
    assert "/device:TPU:0" in out
    assert "fusion.42" in out and "copy.1" in out
    assert "3.000 ms" in out and "x2" in out
