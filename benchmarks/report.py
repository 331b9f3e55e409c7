#!/usr/bin/env python3
"""Benchmark dashboard renderer (reference: benchmarks/dash_app — a
Plotly-Dash app over CSV snapshots; rendered here as a static HTML page
with inline SVG charts, no external dependencies)."""

import argparse
import csv
import html
import os


def load_runs(data_dir):
    runs = {}
    for entry in sorted(os.listdir(data_dir)):
        path = os.path.join(data_dir, entry, "func_benchmarks.csv")
        if os.path.exists(path):
            with open(path) as f:
                runs[entry] = list(csv.DictReader(f))
    return runs


def sparkline(values, width=220, height=36):
    if not values or max(values) == 0:
        return "<svg/>"
    pts = []
    vmax = max(values)
    for i, v in enumerate(values):
        x = 6 + i * (width - 12) / max(len(values) - 1, 1)
        y = height - 6 - (v / vmax) * (height - 12)
        pts.append(f"{x:.1f},{y:.1f}")
    return (
        f'<svg width="{width}" height="{height}">'
        f'<polyline fill="none" stroke="#4477aa" stroke-width="2" '
        f'points="{" ".join(pts)}"/></svg>'
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", required=True)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()
    runs = load_runs(args.data)
    if not runs:
        print("no runs found")
        return

    functions = sorted({r["function"] for rows in runs.values() for r in rows})
    body = ["<h1>curl_tpu function benchmarks over time</h1>",
            f"<p>{len(runs)} snapshots: {', '.join(runs)}</p>", "<table border=1>"]
    body.append("<tr><th>function</th><th>runtime (enc) trend</th>"
                "<th>latest ms</th><th>latest avg rel err</th></tr>")
    for fn in functions:
        series = []
        latest = None
        for name, rows in runs.items():
            for r in rows:
                if r["function"] == fn:
                    series.append(float(r["runtime crypten"]) * 1000)
                    latest = r
        body.append(
            f"<tr><td>{html.escape(fn)}</td><td>{sparkline(series)}</td>"
            f"<td>{series[-1]:.1f}</td>"
            f"<td>{float(latest['average relative err.']):.5f}</td></tr>"
        )
    body.append("</table>")

    out = args.out or os.path.join(args.data, "report.html")
    with open(out, "w") as f:
        f.write("<html><body>" + "\n".join(body) + "</body></html>")
    print("wrote", out)


if __name__ == "__main__":
    main()
