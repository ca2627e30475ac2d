"""Dependency-free SVG charts for the dashboard's HTML export.

The reference renders its four tabs with plotly (px.line / px.area / px.bar /
px.imshow / go.Histogram — /root/reference/streamlit_app/dashboard.py:300-660).
This container has no plotly, so the visual layer is reproduced with hand-
emitted SVG: deterministic strings, stdlib only, no JS. Each helper takes the
SAME rows the distributed operators produce (the tables the dashboard already
prints), so the chart layer adds presentation only — every number remains
oracle-checked upstream.

Chart type map (reference → here):
  px.line   → line_chart (multi-series polylines + axis ticks + legend)
  px.area   → area_chart (stacked cumulative polygons)
  px.bar    → bar_chart
  go.Histogram → bar_chart over the precomputed bins
  px.imshow → heatmap (rect grid, opacity ∝ value)
"""

from __future__ import annotations

import html as _html

# A small categorical palette (SVG named-ish hex colors).
PALETTE = ["#4063d8", "#d66b2c", "#389826", "#9558b2", "#c93a3a", "#0e8a8a"]

W, H = 640, 260
PAD_L, PAD_R, PAD_T, PAD_B = 56, 12, 24, 42


def _esc(s) -> str:
    return _html.escape(str(s))


def _fnum(v: float) -> str:
    s = f"{v:.6g}"
    return s


def _frame(title: str, body: list[str], w: int = W, h: int = H) -> str:
    return (
        f"<svg xmlns='http://www.w3.org/2000/svg' viewBox='0 0 {w} {h}' "
        f"width='{w}' height='{h}' role='img' aria-label='{_esc(title)}'>"
        f"<rect x='0' y='0' width='{w}' height='{h}' fill='white'/>"
        f"<text x='{PAD_L}' y='15' font-size='12' font-family='monospace' "
        f"fill='#333'>{_esc(title)}</text>" + "".join(body) + "</svg>"
    )


def _y_scale(vals: list[float]) -> tuple[float, float]:
    lo = min(0.0, min(vals)) if vals else 0.0
    hi = max(vals) if vals else 1.0
    if hi == lo:
        hi = lo + 1.0
    return lo, hi


def _y_px(v: float, lo: float, hi: float) -> float:
    inner = H - PAD_T - PAD_B
    return PAD_T + inner * (1.0 - (v - lo) / (hi - lo))


def _x_px(i: int, n: int) -> float:
    inner = W - PAD_L - PAD_R
    if n <= 1:
        return PAD_L + inner / 2.0
    return PAD_L + inner * i / (n - 1)


def _axes(x_labels: list[str], lo: float, hi: float) -> list[str]:
    parts = [
        f"<line x1='{PAD_L}' y1='{PAD_T}' x2='{PAD_L}' y2='{H - PAD_B}' stroke='#999'/>",
        f"<line x1='{PAD_L}' y1='{H - PAD_B}' x2='{W - PAD_R}' y2='{H - PAD_B}' stroke='#999'/>",
    ]
    for frac in (0.0, 0.5, 1.0):
        v = lo + (hi - lo) * frac
        y = _y_px(v, lo, hi)
        parts.append(
            f"<text x='{PAD_L - 4}' y='{y + 4:.1f}' font-size='10' text-anchor='end' "
            f"font-family='monospace' fill='#555'>{_fnum(v)}</text>"
        )
        parts.append(
            f"<line x1='{PAD_L}' y1='{y:.1f}' x2='{W - PAD_R}' y2='{y:.1f}' "
            f"stroke='#eee'/>"
        )
    n = len(x_labels)
    step = max(1, n // 8)  # at most ~8 tick labels
    for i in range(0, n, step):
        x = _x_px(i, n)
        parts.append(
            f"<text x='{x:.1f}' y='{H - PAD_B + 14}' font-size='9' text-anchor='middle' "
            f"font-family='monospace' fill='#555'>{_esc(x_labels[i])}</text>"
        )
    return parts


def _legend(names: list[str]) -> list[str]:
    parts = []
    x = PAD_L
    for k, name in enumerate(names):
        c = PALETTE[k % len(PALETTE)]
        parts.append(
            f"<rect x='{x}' y='{H - 14}' width='9' height='9' fill='{c}'/>"
            f"<text x='{x + 12}' y='{H - 6}' font-size='10' font-family='monospace' "
            f"fill='#333'>{_esc(name)}</text>"
        )
        x += 12 + 7 * (len(str(name)) + 2)
    return parts


def line_chart(title: str, x_labels: list[str], series: dict[str, list[float]]) -> str:
    """Multi-series line chart (px.line). `series` maps name → y values
    aligned with x_labels; missing points may be None (gap)."""
    all_vals = [v for ys in series.values() for v in ys if v is not None]
    lo, hi = _y_scale(all_vals)
    body = _axes(x_labels, lo, hi)
    n = len(x_labels)
    for k, (name, ys) in enumerate(series.items()):
        c = PALETTE[k % len(PALETTE)]
        pts = [
            f"{_x_px(i, n):.1f},{_y_px(v, lo, hi):.1f}"
            for i, v in enumerate(ys)
            if v is not None
        ]
        if pts:
            body.append(
                f"<polyline points='{' '.join(pts)}' fill='none' stroke='{c}' "
                f"stroke-width='1.5'/>"
            )
    body.extend(_legend(list(series)))
    return _frame(title, body)


def area_chart(title: str, x_labels: list[str], series: dict[str, list[float]]) -> str:
    """Stacked area chart (px.area): series stacked bottom-up in dict
    order; each layer is a closed polygon between its cumulative baseline
    and baseline + its own values."""
    n = len(x_labels)
    base = [0.0] * n
    layers: list[tuple[str, list[float], list[float]]] = []
    for name, ys in series.items():
        top = [b + (v or 0.0) for b, v in zip(base, ys)]
        layers.append((name, list(base), top))
        base = top
    lo, hi = _y_scale(base)  # final cumulative top bounds the axis
    body = _axes(x_labels, lo, hi)
    for k, (name, lo_ys, hi_ys) in enumerate(layers):
        c = PALETTE[k % len(PALETTE)]
        fwd = [f"{_x_px(i, n):.1f},{_y_px(v, lo, hi):.1f}" for i, v in enumerate(hi_ys)]
        back = [
            f"{_x_px(i, n):.1f},{_y_px(v, lo, hi):.1f}"
            for i, v in reversed(list(enumerate(lo_ys)))
        ]
        body.append(
            f"<polygon points='{' '.join(fwd + back)}' fill='{c}' fill-opacity='0.55' "
            f"stroke='{c}' stroke-width='0.5'/>"
        )
    body.extend(_legend(list(series)))
    return _frame(title, body)


def bar_chart(title: str, items: list[tuple[str, float]]) -> str:
    """Vertical bar chart (px.bar / go.Histogram over precomputed bins)."""
    vals = [v for _, v in items]
    lo, hi = _y_scale(vals)
    body = _axes([lab for lab, _ in items], lo, hi)
    n = len(items)
    inner = W - PAD_L - PAD_R
    bw = max(2.0, inner / max(n, 1) * 0.7)
    for i, (_lab, v) in enumerate(items):
        x = _x_px(i, n) - bw / 2
        y = _y_px(v, lo, hi)
        y0 = _y_px(0.0, lo, hi)
        top, hgt = (y, y0 - y) if v >= 0 else (y0, y - y0)
        body.append(
            f"<rect x='{x:.1f}' y='{top:.1f}' width='{bw:.1f}' height='{max(hgt, 0):.1f}' "
            f"fill='{PALETTE[0]}' fill-opacity='0.85'/>"
        )
    return _frame(title, body)


def heatmap(title: str, row_labels: list[str], col_labels: list[str],
            values: list[list[float]]) -> str:
    """Rect-grid heatmap (px.imshow): cell opacity ∝ value / max."""
    flat = [v for row in values for v in row if v is not None]
    vmax = max(flat) if flat else 1.0
    vmax = vmax or 1.0
    nr, nc = len(row_labels), len(col_labels)
    inner_w = W - PAD_L - PAD_R
    inner_h = H - PAD_T - PAD_B
    cw, ch = inner_w / max(nc, 1), inner_h / max(nr, 1)
    body = []
    for i, rl in enumerate(row_labels):
        body.append(
            f"<text x='{PAD_L - 4}' y='{PAD_T + ch * (i + 0.5) + 3:.1f}' font-size='9' "
            f"text-anchor='end' font-family='monospace' fill='#555'>{_esc(rl)}</text>"
        )
        for j in range(nc):
            v = values[i][j] if values[i][j] is not None else 0.0
            body.append(
                f"<rect x='{PAD_L + cw * j:.1f}' y='{PAD_T + ch * i:.1f}' "
                f"width='{cw:.1f}' height='{ch:.1f}' fill='{PALETTE[0]}' "
                f"fill-opacity='{v / vmax:.3f}' stroke='#fff' stroke-width='0.5'/>"
            )
    step = max(1, nc // 8)
    for j in range(0, nc, step):
        body.append(
            f"<text x='{PAD_L + cw * (j + 0.5):.1f}' y='{H - PAD_B + 14}' font-size='9' "
            f"text-anchor='middle' font-family='monospace' fill='#555'>"
            f"{_esc(col_labels[j])}</text>"
        )
    return _frame(title, body)
