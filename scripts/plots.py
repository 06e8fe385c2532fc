"""B7: chart generation for sweep results — tidy CSV in, standalone SVG out.

The reference's benchmark assets are notebook-style plots of its shell-
script sweeps (SURVEY.md §2.7 B7); this is the same deliverable without
a notebook: ``scripts/sweeps.py`` writes tidy CSV, this renders it.
Pure stdlib (no matplotlib in the runtime image) — the SVG is hand-
rolled but follows a real chart spec: one measure per panel (never a
dual axis), a single series per panel (title carries identity, no
legend), 2px data lines with 8px markers, recessive grid, text in
ink tokens rather than series color, and per-point ``<title>`` hover
labels.

Usage:
    python scripts/plots.py --csv /tmp/sweep_k.csv --out /tmp/sweep_k.svg
"""

from __future__ import annotations

import argparse
import csv
import math
import sys
from collections import defaultdict

# palette: categorical slot 1 (blue) on the light surface; ink tokens
SERIES = "#2a78d6"
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK_2 = "#52514e"
GRID = "#e4e3df"

W, H_PANEL, PAD_L, PAD_R, PAD_T, PAD_B = 640, 240, 64, 24, 40, 44


def _ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    """Loose nice-number ticks covering [lo, hi]."""
    if hi <= lo:
        hi = lo + 1.0
    raw = (hi - lo) / max(1, n)
    mag = 10 ** math.floor(math.log10(raw))
    for m in (1, 2, 2.5, 5, 10):
        if raw <= m * mag:
            step = m * mag
            break
    t0 = math.floor(lo / step) * step
    out = []
    t = t0
    while t <= hi + step * 1e-9:
        out.append(round(t, 10))
        t += step
    return out


def _fmt(v: float) -> str:
    if v == 0:
        return "0"
    if abs(v) >= 1e6 or abs(v) < 1e-3:
        return f"{v:.1e}"
    if abs(v) >= 100 or float(v).is_integer():
        return f"{v:,.0f}"
    return f"{v:g}"


def _panel(
    x_name: str,
    y_name: str,
    pts: list[tuple[float, float]],
    reps: list[tuple[float, float]],
    y_off: int,
    title: str,
) -> str:
    xs = [p[0] for p in pts + reps]
    ys = [p[1] for p in pts + reps]
    x_lo, x_hi = min(xs), max(xs)
    y_ticks = _ticks(min(ys), max(ys))
    y_lo, y_hi = y_ticks[0], y_ticks[-1]
    x_ticks = _ticks(x_lo, x_hi)
    plot_w = W - PAD_L - PAD_R
    plot_h = H_PANEL - PAD_T - PAD_B

    def sx(v: float) -> float:
        if x_hi == x_lo:
            return PAD_L + plot_w / 2
        return PAD_L + (v - x_lo) / (x_hi - x_lo) * plot_w

    def sy(v: float) -> float:
        return y_off + PAD_T + plot_h - (v - y_lo) / (y_hi - y_lo) * plot_h

    s = [
        f'<text x="{PAD_L}" y="{y_off + 20}" fill="{INK}" '
        f'font-size="14" font-weight="600">{title}</text>'
    ]
    for t in y_ticks:  # recessive horizontal grid + axis labels
        y = sy(t)
        s.append(
            f'<line x1="{PAD_L}" y1="{y:.1f}" x2="{W - PAD_R}" y2="{y:.1f}" '
            f'stroke="{GRID}" stroke-width="1"/>'
        )
        s.append(
            f'<text x="{PAD_L - 8}" y="{y + 4:.1f}" fill="{INK_2}" '
            f'font-size="11" text-anchor="end">{_fmt(t)}</text>'
        )
    for t in x_ticks:
        if t < x_lo - 1e-9 or t > x_hi + 1e-9:
            continue
        x = sx(t)
        s.append(
            f'<text x="{x:.1f}" y="{y_off + H_PANEL - PAD_B + 18}" '
            f'fill="{INK_2}" font-size="11" text-anchor="middle">{_fmt(t)}</text>'
        )
    s.append(
        f'<text x="{(PAD_L + W - PAD_R) / 2}" y="{y_off + H_PANEL - 8}" '
        f'fill="{INK_2}" font-size="12" text-anchor="middle">{x_name}</text>'
    )
    # raw repetition points (muted, behind the mean line)
    for vx, vy in reps:
        s.append(
            f'<circle cx="{sx(vx):.1f}" cy="{sy(vy):.1f}" r="3" '
            f'fill="{SERIES}" fill-opacity="0.25"/>'
        )
    path = " ".join(
        f"{'M' if i == 0 else 'L'}{sx(vx):.1f},{sy(vy):.1f}"
        for i, (vx, vy) in enumerate(pts)
    )
    s.append(
        f'<path d="{path}" fill="none" stroke="{SERIES}" stroke-width="2" '
        'stroke-linejoin="round"/>'
    )
    for vx, vy in pts:  # 8px markers w/ hover labels
        s.append(
            f'<circle cx="{sx(vx):.1f}" cy="{sy(vy):.1f}" r="4" '
            f'fill="{SERIES}" stroke="{SURFACE}" stroke-width="2">'
            f"<title>{x_name}={_fmt(vx)}, {y_name}={_fmt(vy)}</title></circle>"
        )
    return "\n".join(s)


def render_sweep_svg(csv_path: str, out_path: str) -> None:
    """Render one sweep CSV (x column first) to a two-panel SVG:
    mean WCSS vs x and mean runtime vs x, reps as muted points."""
    with open(csv_path, newline="") as f:
        rows = list(csv.DictReader(f))
    if not rows:
        raise SystemExit(f"{csv_path}: empty sweep CSV")
    cols = list(rows[0].keys())
    x_name = cols[0]
    panels = []
    y_off = 0
    for y_name, title in (
        ("wcss", "WCSS vs " + x_name),
        ("runtime_ms", "Runtime (ms) vs " + x_name),
    ):
        if y_name not in cols:
            continue
        groups: dict[float, list[float]] = defaultdict(list)
        for r in rows:
            groups[float(r[x_name])].append(float(r[y_name]))
        pts = sorted((x, sum(v) / len(v)) for x, v in groups.items())
        reps = (
            [(float(r[x_name]), float(r[y_name])) for r in rows]
            if "rep" in cols
            else []
        )
        panels.append(_panel(x_name, y_name, pts, reps, y_off, title))
        y_off += H_PANEL
    svg = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" '
        f'height="{y_off}" font-family="system-ui, sans-serif">\n'
        f'<rect width="{W}" height="{y_off}" fill="{SURFACE}"/>\n'
        + "\n".join(panels)
        + "\n</svg>\n"
    )
    with open(out_path, "w") as f:
        f.write(svg)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Render sweep CSV to SVG (B7)")
    p.add_argument("--csv", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    render_sweep_svg(args.csv, args.out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
