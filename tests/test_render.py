"""The README perf table must be a pure function of the sweep artifact
(round-2 verdict: the table had been hand-extended past the artifact)."""

import json
import os

from winograd_tpu.bench.render import HEADER, render, render_row

ROW = {
    "mode": 0,
    "name": "winograd3x3_128",
    "pallas_device_us": 3.1341,
    "direct_device_us": 4.04,
    "winograd_f43_device_us": 5.93,
    "bf16w_device_us": None,
    "int8_device_us": 3.06,
    "mfu_pallas": 0.094,
    "xla_device_us": 4.2012,
    "max_error_pallas": 1.62e-05,
}


def test_render_row_cells():
    row = render_row(ROW)
    cells = [c.strip() for c in row.strip("|").split("|")]
    assert cells == [
        "0", "winograd3x3_128",
        "**3.13** (direct 4.0; F(4,3) 5.9)",
        "—", "—", "3.1", "9.4%", "4.20", "59", "1.6e-05", "—",
    ]


def test_render_row_pre_column():
    r = dict(ROW, mode=16, name="resnet50_full", pre_device_us=186.73)
    cells = [c.strip() for c in render_row(r).strip("|").split("|")]
    assert cells[3] == "186.7"


def test_render_row_grad_error_column():
    r = dict(ROW, mode=19, name="resnet50_full_trainstep",
             direct_device_us=None, winograd_f43_device_us=None,
             train_grad_rel_error=6.45e-07)
    cells = [c.strip() for c in render_row(r).strip("|").split("|")]
    assert cells[-1] == "6.4e-07"


def test_render_row_no_alts_no_ref():
    r = dict(ROW, mode=13, name="resnet50_backbone_13",
             direct_device_us=None, winograd_f43_device_us=None,
             bf16w_device_us=104.8, pallas_device_us=1301.44,
             mfu_pallas=None)
    cells = [c.strip() for c in render_row(r).strip("|").split("|")]
    assert cells[2] == "**1301.4**"   # >=1ms renders 1 decimal, no alts
    assert cells[4] == "104.8"
    assert cells[6] == "—"            # missing MFU
    assert cells[8] == "—"            # no reference CUDA number

def test_render_sorts_and_headers():
    rows = [dict(ROW, mode=5, name="b"), dict(ROW, mode=2, name="a")]
    out = render(rows).splitlines()
    assert out[0] + "\n" + out[1] == HEADER
    assert out[2].startswith("| 2 |") and out[3].startswith("| 5 |")


def test_render_r02_artifact_roundtrip():
    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_FULL_r02.json")
    with open(path) as f:
        rows = json.load(f)
    out = render(rows).splitlines()
    # rows + header(2) + the HBM-floor-tie footnote (blank line + prose,
    # present because the artifact covers modes 11/12).
    assert len(out) == 2 + len(rows) + 2
    assert out[-1].startswith("†")
    # Spot-check a known row against the artifact's values.
    mode12 = next(l for l in out if l.startswith("| 12 |"))
    assert "**56.41**" in mode12 and "55.31" in mode12
    assert "†" in mode12  # the annotated HBM-floor tie


def test_update_readme_roundtrip(tmp_path):
    from winograd_tpu.bench.render import TABLE_END, TABLE_START, update_readme

    md = tmp_path / "README.md"
    md.write_text(
        "# x\n\n" + TABLE_START + "\n| 0 | old | row |\n" + TABLE_END + "\ntail\n"
    )
    rows = [dict(ROW)]
    update_readme(str(md), rows)
    text = md.read_text()
    assert "**3.13** (direct 4.0; F(4,3) 5.9)" in text
    assert "old" not in text and text.endswith("tail\n")

    # Refuses to DROP a published mode (the r2 stale-table failure shape).
    import pytest

    with pytest.raises(SystemExit):
        update_readme(str(md), [dict(ROW, mode=5)])
    # Refuses a file without markers.
    bare = tmp_path / "bare.md"
    bare.write_text("no markers here\n")
    with pytest.raises(SystemExit):
        update_readme(str(bare), rows)


def test_committed_readme_matches_cited_artifact():
    """The repo's own README table must match, cell for cell, the sweep
    artifact its prose cites (BENCH_FULL_rNN.json). This is the standing
    guard against the r2/r3 failure shape: published rows drifting from
    the committed measurement."""
    import re

    from winograd_tpu.bench.render import check_readme

    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "README.md")) as f:
        text = f.read()
    cited = re.search(r"BENCH_FULL_r\d+\.json", text)
    assert cited, "README must cite the sweep artifact it renders"
    with open(os.path.join(root, cited.group(0))) as f:
        rows = json.load(f)
    check_readme(os.path.join(root, "README.md"), rows)


def test_check_readme_value_mismatch(tmp_path):
    """--check must FAIL when a published CELL differs from the artifact
    (the r3 stale-value failure shape: rows present but 24% off)."""
    import pytest

    from winograd_tpu.bench.render import TABLE_END, TABLE_START, check_readme, update_readme

    md = tmp_path / "README.md"
    md.write_text("# x\n\n" + TABLE_START + "\n" + TABLE_END + "\ntail\n")
    rows = [dict(ROW)]
    update_readme(str(md), rows)
    check_readme(str(md), rows)  # freshly regenerated table passes

    # A drifted value in the artifact (as if README went stale) must fail
    # and name the offending cell.
    drifted = [dict(ROW, pallas_device_us=9.99)]
    with pytest.raises(SystemExit) as e:
        check_readme(str(md), drifted)
    assert "mode 0" in str(e.value) and "9.99" in str(e.value)

    # A published row the artifact lacks must fail too.
    extra = md.read_text().replace(
        TABLE_END, "| 7 | ghost | **1.00** | — | — | — | 1.00 | — | 1.0e-06 | — |\n" + TABLE_END
    )
    md.write_text(extra)
    with pytest.raises(SystemExit) as e:
        check_readme(str(md), rows)
    assert "mode 7" in str(e.value)
