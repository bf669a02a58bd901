"""The standing sf0.1 scale-gate lane (tools/scale_gate.py) must always
reference real queries() entries — guards the lane against rot when
queries are renamed."""

from __future__ import annotations


def test_lane_names_exist():
    import sys

    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tools")
    import __ray_entry__ as e
    from scale_gate import LANE

    names = set(e.queries())
    missing = [n for n in LANE if n not in names]
    assert not missing, f"scale_gate lane references unknown queries: {missing}"
    assert len(LANE) == len(set(LANE)), "duplicate lane entries"
