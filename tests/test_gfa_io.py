"""GFA read utility (io/gfa.py, the GfaParser counterpart): round-trips
the GFA files the framework itself writes."""

import numpy as np

from metamdbg_tpu.io import gfa as gfa_io


def test_roundtrip_written_gfa(tmp_path):
    path = str(tmp_path / "g.gfa")
    with open(path, "w") as f:
        f.write("H\tVN:Z:1.0\n")
        f.write("S\tutg0\tACGT\tLN:i:4\tdp:i:12.5\n")
        f.write("S\tutg1\t*\tLN:i:120\tdp:i:3.000000\n")
        f.write("L\tutg0\t+\tutg1\t-\t1M\n")
        f.write("L\tutg1\t-\tutg0\t+\t1M\n")

    segs, links = gfa_io.parse_gfa(path)
    assert [s.name for s in segs] == ["utg0", "utg1"]
    assert segs[0].seq == "ACGT" and segs[0].length == 4
    assert segs[1].seq is None and segs[1].length == 120
    assert segs[0].tags["dp"] == ("i", "12.5")
    assert [(l.from_name, l.from_orient, l.to_name, l.to_orient)
            for l in links] == [("utg0", "+", "utg1", "-"),
                                ("utg1", "-", "utg0", "+")]
    assert gfa_io.tokenize("S\tutg0\t*\n") == ["S", "utg0", "*"]


def test_roundtrip_filtergraph_export(tmp_path):
    """FilterGraph.save_gfa output parses back with consistent S/L names."""
    from simplify_scale import build_synthetic_filter_graph

    g = build_synthetic_filter_graph(50, seed=3)
    path = str(tmp_path / "fg.gfa")
    g.save_gfa(path)
    segs, links = gfa_io.parse_gfa(path)
    assert len(segs) == len([u for u in g.unitigs if u is not None])
    names = {s.name for s in segs}
    for l in links:
        assert l.from_name in names and l.to_name in names
