"""Regenerate DESIGN.md's per-mode roofline table from a sweep artifact.

Usage: python tools/design_tables.py [BENCH_FULL_rNN.json]

The table makes every README headline traceable to a floor argument (the
report.pdf role, /root/reference/report.pdf Tables 1-3): per mode it lists
the dominant streamed bytes (weights + boundary activations at f32), the
measured device time, the HBM floor those bytes imply at the v5e STREAM
rate actually measured on these kernels (~500 GB/s on weight streams; the
nominal pin rate is 819 GB/s), and the achieved MFU. Written between the
<!-- roofline:begin/end --> markers so the narrative around it is stable.
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, ".")

from winograd_tpu.config import (  # noqa: E402
    CASES,
    BackboneConfig,
    BasicNetConfig,
    BlockConfig,
    LayerConfig,
    ResNet50Config,
    StemConfig,
    TransitionConfig,
)

# Nominal HBM pin bandwidth (v5e) and the measured steady stream rate of
# these kernels' weight streams (CLAUDE.md round-2 finding: f32 conv5_x /
# transitions sit at ~450-500 GB/s — an honest f32 HBM bound).
HBM_NOMINAL = 819e9
HBM_MEASURED = 500e9


def _layer_bytes(cin, cout, hw, k=9, batch=1):
    """f32 streamed bytes of one fused conv layer: the offline weight
    matrix + the activation in/out at the layer boundary."""
    return 4 * (k * cin * cout + batch * hw * hw * (cin + cout))


def weight_act_bytes(cfg) -> int | None:
    """Dominant f32 HBM bytes of a mode's custom path (weights streamed
    once per inference + boundary activations; VMEM-resident intermediates
    excluded — that's the fused kernels' point)."""
    if isinstance(cfg, LayerConfig):
        k = 9 if cfg.kind == "winograd3x3" else 1
        if cfg.kind == "winograd3x3":
            k = 16  # F(2,3) streams the (16, Cin, Cout) transformed filter
        return _layer_bytes(cfg.cin, cfg.cout, cfg.hw, k)
    if isinstance(cfg, TransitionConfig):
        ho = -(-cfg.hw // 2)
        wbytes = 4 * (
            cfg.c_in * cfg.c_mid + 9 * cfg.c_mid * cfg.c_mid
            + cfg.c_mid * cfg.c_out + cfg.c_in * cfg.c_out
        )
        abytes = 4 * cfg.batch * (
            cfg.hw * cfg.hw * cfg.c_in + ho * ho * cfg.c_out
        )
        return wbytes + abytes
    if isinstance(cfg, BlockConfig):
        wbytes = 4 * cfg.blocks * (
            2 * cfg.c_io * cfg.c_mid + 9 * cfg.c_mid * cfg.c_mid
        )
        abytes = 4 * cfg.batch * cfg.hw * cfg.hw * 2 * cfg.c_io
        return wbytes + abytes
    if isinstance(cfg, BasicNetConfig):
        total = 4 * cfg.stem_c * 3 * 49  # stem 7x7 filter
        prev = cfg.stem_c
        hw = cfg.img // 4
        act = 4 * cfg.batch * (cfg.img ** 2 * 3 + cfg.stages[-1][0])
        for c, _hw, blocks in cfg.stages:
            if prev != c:
                total += 4 * (9 * prev * c + 9 * c * c + prev * c)
                blocks -= 1
                hw = hw // 2
            total += 4 * blocks * 2 * 9 * c * c
            prev = c
        total += 4 * cfg.stages[-1][0] * cfg.num_classes
        return total + act
    if isinstance(cfg, ResNet50Config):
        c_io0, c_mid0, hw0, blocks0 = cfg.stages[0]
        total = 4 * cfg.stem_c * 3 * 49
        total += 4 * (
            cfg.stem_c * c_mid0 + 9 * c_mid0 * c_mid0
            + c_mid0 * c_io0 + cfg.stem_c * c_io0
        )
        prev = None
        for c_io, c_mid, hw, blocks in cfg.stages:
            if prev is not None:
                total += 4 * (
                    prev * c_mid + 9 * c_mid * c_mid
                    + c_mid * c_io + prev * c_io
                )
            total += 4 * blocks * (2 * c_io * c_mid + 9 * c_mid * c_mid)
            prev = c_io
        total += 4 * cfg.stages[-1][0] * cfg.num_classes
        act = 4 * cfg.batch * (cfg.img ** 2 * 3 + cfg.num_classes)
        return total + act
    if isinstance(cfg, BackboneConfig):
        total = 0
        prev = None
        for c_io, c_mid, hw, blocks in cfg.stages:
            if prev is not None:
                total += 4 * (
                    prev * c_mid + 9 * c_mid * c_mid
                    + c_mid * c_io + prev * c_io
                )
            total += 4 * blocks * (2 * c_io * c_mid + 9 * c_mid * c_mid)
            prev = c_io
        first = cfg.stages[0]
        act = 4 * cfg.batch * (
            (2 * first[2]) ** 2 if prev is None else first[2] ** 2
        ) * first[0]
        return total + act
    if isinstance(cfg, StemConfig):
        hs = cfg.img // 2
        return 4 * (49 * cfg.cin * cfg.cout) + 4 * cfg.batch * (
            cfg.img ** 2 * cfg.cin + (cfg.img // 4) ** 2 * cfg.cout
        )
    return None


def render_table(rows) -> str:
    out = [
        "| mode | case | streamed MB (f32) | floor µs @500 GB/s | "
        "measured f32 µs | ratio | MFU f32 | MFU int8 |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in sorted(rows, key=lambda r: r["mode"]):
        cfg = CASES.get(r["mode"])
        if cfg is None:
            continue
        b = weight_act_bytes(cfg)
        dev = r.get("pallas_device_us")
        if b is None or dev is None:
            continue
        floor = b / HBM_MEASURED * 1e6
        mfu = r.get("mfu_pallas")
        i8 = r.get("int8_device_us")
        flops = r.get("flops")
        mfu_i8 = (
            f"{flops / (i8 * 1e-6) / 197e12 * 100:.1f}%"
            if (i8 and flops) else "—"
        )
        out.append(
            f"| {r['mode']} | {r['name']} | {b / 2**20:.2f} | {floor:.1f} | "
            f"{dev:.1f} | {dev / floor:.2f}x | "
            f"{f'{mfu * 100:.1f}%' if mfu else '—'} | {mfu_i8} |"
        )
    return "\n".join(out)


def main(argv):
    artifact = argv[1] if len(argv) > 1 else "BENCH_FULL_r05.json"
    rows = json.load(open(artifact))
    table = render_table(rows)
    path = "DESIGN.md"
    text = open(path).read()
    new = re.sub(
        r"(<!-- roofline:begin -->\n).*?(\n<!-- roofline:end -->)",
        lambda m: m.group(1) + f"_Source: `{artifact}`._\n\n" + table + m.group(2),
        text,
        flags=re.S,
    )
    open(path, "w").write(new)
    print(f"DESIGN.md roofline table regenerated from {artifact}")


if __name__ == "__main__":
    main(sys.argv)
