#!/usr/bin/env python3
"""Interactive benchmark dashboard generator.

Parity scope: reference benchmarks/dash_app/app.py (a Plotly-Dash server
over CSV snapshots: per-function runtime/error views, model views, run
comparison and time series). This environment has no dash/plotly and the
product surface is a repo, not a server — so the dashboard is generated as
ONE self-contained interactive HTML file (vanilla JS + inline SVG: series
toggles, crosshair + tooltip, snapshot dropdown, table views, light/dark).

Data sources (all optional, rendered if present):
  benchmarks/results/history.jsonl       headline runs (bench.py appends)
  benchmarks/results/func_bench_*.json   per-function runtime/error snapshots
  benchmarks/baseline_measured.json      reference CPU baselines

Usage: python benchmarks/dashboard.py [--out benchmarks/results/dashboard.html]
"""

import argparse
import glob
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def load_history(path):
    runs = []
    if not os.path.exists(path):
        return runs
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            det = rec.get("detail", {})
            runs.append(
                {
                    "ts": rec.get("ts", ""),
                    "metric": rec.get("metric", ""),
                    "tokps": rec.get("value"),
                    "vs_baseline": rec.get("vs_baseline"),
                    "latency_sec": det.get("latency_sec"),
                    "compile_sec": det.get("compile_sec"),
                    "seq": det.get("seq_len"),
                    "batch": det.get("batch"),
                    "backend": det.get("backend"),
                    # runs before the timing fix used block_until_ready,
                    # which returns early on the remote platform — flag them
                    "honest": "timing" in det,
                }
            )
    return runs


def load_func_snapshots(results_dir):
    snaps = {}
    for path in sorted(glob.glob(os.path.join(results_dir, "func_bench_*.json"))):
        name = os.path.basename(path)[len("func_bench_"):-len(".json")]
        with open(path) as f:
            snaps[name] = json.load(f)
    return snaps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--out", default=os.path.join(HERE, "results", "dashboard.html")
    )
    args = parser.parse_args()

    data = {
        "history": load_history(os.path.join(HERE, "results", "history.jsonl")),
        "func_snapshots": load_func_snapshots(os.path.join(HERE, "results")),
        "baseline": {},
    }
    baseline_path = os.path.join(HERE, "baseline_measured.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            data["baseline"] = json.load(f)

    html = TEMPLATE.replace("/*__DATA__*/null", json.dumps(data))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(html)
    print(f"wrote {args.out} ({os.path.getsize(args.out)} bytes, "
          f"{len(data['history'])} runs, {len(data['func_snapshots'])} func snapshots)")


TEMPLATE = r"""<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>curl_tpu benchmarks</title>
<style>
  .viz-root {
    color-scheme: light;
    --surface-1: #fcfcfb; --surface-2: #f1f0ee;
    --text-primary: #0b0b0b; --text-secondary: #52514e; --text-muted: #8a897f;
    --grid: #e4e3df;
    --series-1: #2a78d6; --series-2: #eb6834; --series-3: #1baf7a;
  }
  @media (prefers-color-scheme: dark) {
    :root:where(:not([data-theme="light"])) .viz-root {
      color-scheme: dark;
      --surface-1: #1a1a19; --surface-2: #242423;
      --text-primary: #ffffff; --text-secondary: #c3c2b7; --text-muted: #85847a;
      --grid: #32322f;
      --series-1: #3987e5; --series-2: #d95926; --series-3: #199e70;
    }
  }
  :root[data-theme="dark"] .viz-root {
    color-scheme: dark;
    --surface-1: #1a1a19; --surface-2: #242423;
    --text-primary: #ffffff; --text-secondary: #c3c2b7; --text-muted: #85847a;
    --grid: #32322f;
    --series-1: #3987e5; --series-2: #d95926; --series-3: #199e70;
  }
  body { margin: 0; }
  .viz-root {
    background: var(--surface-1); color: var(--text-primary);
    font: 14px/1.45 system-ui, sans-serif; min-height: 100vh;
    padding: 24px; box-sizing: border-box;
  }
  h1 { font-size: 20px; margin: 0 0 4px; }
  .sub { color: var(--text-secondary); margin: 0 0 20px; }
  .filters { display: flex; gap: 12px; align-items: center; flex-wrap: wrap;
             margin: 0 0 20px; }
  .filters label { color: var(--text-secondary); }
  select, button {
    background: var(--surface-2); color: var(--text-primary);
    border: 1px solid var(--grid); border-radius: 6px; padding: 4px 8px;
    font: inherit; cursor: pointer;
  }
  .tiles { display: flex; gap: 16px; flex-wrap: wrap; margin-bottom: 24px; }
  .tile { background: var(--surface-2); border-radius: 10px; padding: 14px 18px;
          min-width: 170px; }
  .tile .label { color: var(--text-secondary); font-size: 13px; }
  .tile .value { font-size: 26px; font-weight: 650; margin-top: 2px; }
  .tile .delta { color: var(--text-muted); font-size: 12px; margin-top: 2px; }
  .card { background: var(--surface-2); border-radius: 10px; padding: 16px;
          margin-bottom: 20px; position: relative; }
  .card h2 { font-size: 15px; margin: 0 0 2px; }
  .card .note { color: var(--text-muted); font-size: 12px; margin: 0 0 10px; }
  .legend { display: flex; gap: 14px; flex-wrap: wrap; margin: 6px 0 4px;
            font-size: 12px; color: var(--text-secondary); }
  .legend .key { display: inline-flex; align-items: center; gap: 6px;
                 cursor: pointer; user-select: none; }
  .legend .key.off { opacity: 0.35; }
  .legend .swatch-line { width: 16px; height: 2px; border-radius: 1px; }
  .legend .swatch-rect { width: 10px; height: 10px; border-radius: 3px; }
  svg text { fill: var(--text-secondary); font: 11px system-ui, sans-serif; }
  svg .axis-label { fill: var(--text-muted); }
  .tooltip {
    position: absolute; pointer-events: none; background: var(--surface-1);
    border: 1px solid var(--grid); border-radius: 8px; padding: 8px 10px;
    font-size: 12px; display: none; box-shadow: 0 2px 10px rgba(0,0,0,.12);
    z-index: 5; max-width: 300px;
  }
  .tooltip .t-title { color: var(--text-muted); margin-bottom: 4px; }
  .tooltip .row { display: flex; align-items: center; gap: 6px; }
  .tooltip .row .v { font-weight: 650; color: var(--text-primary); }
  .tooltip .row .k { color: var(--text-secondary); }
  .tooltip .lk { display:inline-block; width: 12px; height: 2px; }
  table { border-collapse: collapse; width: 100%; font-size: 12px;
          margin-top: 8px; }
  th, td { text-align: right; padding: 3px 8px; border-bottom: 1px solid var(--grid); }
  th:first-child, td:first-child { text-align: left; }
  th { color: var(--text-secondary); font-weight: 600; }
  .tbl-toggle { font-size: 12px; margin-top: 6px; }
  .hidden { display: none; }
</style>
</head>
<body>
<div class="viz-root" id="root">
  <h1>curl_tpu benchmark dashboard</h1>
  <p class="sub">Headline private-inference runs, per-function runtime and
  approximation error. Reference surface: benchmarks/dash_app (Plotly-Dash);
  rendered here as one dependency-free file.</p>

  <div class="filters">
    <label>Function snapshot
      <select id="snapSel"></select>
    </label>
    <label><input type="checkbox" id="artifactToggle">
      include pre-fix runs (broken async timing)</label>
    <button id="themeBtn" type="button">toggle dark</button>
  </div>

  <div class="tiles" id="tiles"></div>
  <div id="charts"></div>
</div>
<script>
const DATA = /*__DATA__*/null;
const css = name => getComputedStyle(document.getElementById('root'))
    .getPropertyValue(name).trim();
const SERIES_VARS = ['--series-1', '--series-2', '--series-3'];
const fmt = (v, d=1) => v == null ? '–' : Number(v).toLocaleString(
    undefined, {maximumFractionDigits: d});

document.getElementById('themeBtn').onclick = () => {
  const r = document.documentElement;
  r.dataset.theme = r.dataset.theme === 'dark' ? 'light' : 'dark';
  render();
};

// ---------- generic helpers ----------
function el(tag, attrs={}, parent=null) {
  const ns = 'http://www.w3.org/2000/svg';
  const e = ['svg','g','path','rect','line','circle','text','polyline']
      .includes(tag) ? document.createElementNS(ns, tag)
                     : document.createElement(tag);
  for (const [k, v] of Object.entries(attrs)) e.setAttribute(k, v);
  if (parent) parent.appendChild(e);
  return e;
}
function niceTicks(lo, hi, n=5) {
  if (!(hi > lo)) hi = lo + 1;
  const span = hi - lo, step0 = span / n,
        mag = Math.pow(10, Math.floor(Math.log10(step0))),
        norm = step0 / mag,
        step = (norm < 1.5 ? 1 : norm < 3.5 ? 2 : norm < 7.5 ? 5 : 10) * mag;
  const t = [];
  for (let v = Math.ceil(lo/step)*step; v <= hi + 1e-12; v += step) t.push(v);
  return t;
}

// ---------- line chart with crosshair tooltip ----------
function lineChart(card, spec) {
  // spec: {series: [{name, points: [{x(ts str), y, meta}]}, ...], yLabel}
  const W = Math.min(card.clientWidth - 8, 960), H = 260,
        M = {l: 56, r: 16, t: 10, b: 28};
  const on = spec.series.map(() => true);
  const wrap = el('div', {}, card);
  const legend = el('div', {class: 'legend'}, wrap);
  const svg = el('svg', {width: W, height: H, role: 'img',
                         'aria-label': spec.yLabel}, wrap);
  const tip = el('div', {class: 'tooltip'}, card);

  if (spec.series.length > 1)
    spec.series.forEach((s, i) => {
      const key = el('span', {class: 'key'}, legend);
      const sw = el('span', {class: 'swatch-line'}, key);
      sw.style.background = css(SERIES_VARS[i % 3]);
      key.appendChild(document.createTextNode(s.name));
      key.onclick = () => { on[i] = !on[i];
        key.classList.toggle('off', !on[i]); draw(); };
    });

  const xs = [...new Set(spec.series.flatMap(s => s.points.map(p => p.x)))].sort();
  const xi = Object.fromEntries(xs.map((x, i) => [x, i]));
  function draw() {
    while (svg.firstChild) svg.removeChild(svg.firstChild);
    const pts = spec.series.flatMap((s, i) => on[i] ? s.points : []);
    if (!pts.length) return;
    let yMax = Math.max(...pts.map(p => p.y)), yMin = 0;
    const X = x => M.l + (xs.length < 2 ? 0.5 : xi[x]/(xs.length-1)) * (W-M.l-M.r);
    const Y = y => H - M.b - (y - yMin)/(yMax - yMin || 1) * (H-M.t-M.b);
    for (const t of niceTicks(yMin, yMax)) {
      el('line', {x1: M.l, x2: W-M.r, y1: Y(t), y2: Y(t),
                  stroke: css('--grid'), 'stroke-width': 1}, svg);
      el('text', {x: M.l-6, y: Y(t)+4, 'text-anchor': 'end'}, svg)
          .textContent = fmt(t, 2);
    }
    const xticks = xs.length <= 6 ? xs : xs.filter(
        (_, i) => i % Math.ceil(xs.length/6) === 0);
    for (const x of xticks)
      el('text', {x: X(x), y: H-8, 'text-anchor': 'middle'}, svg)
          .textContent = x.slice(5, 16).replace('T', ' ');
    spec.series.forEach((s, i) => {
      if (!on[i]) return;
      const color = css(SERIES_VARS[i % 3]);
      el('polyline', {fill: 'none', stroke: color, 'stroke-width': 2,
        'stroke-linejoin': 'round', 'stroke-linecap': 'round',
        points: s.points.map(p => `${X(p.x)},${Y(p.y)}`).join(' ')}, svg);
      for (const p of s.points) {
        el('circle', {cx: X(p.x), cy: Y(p.y), r: 4.5, fill: color,
                      stroke: css('--surface-2'), 'stroke-width': 2}, svg);
      }
    });
    // crosshair + shared tooltip
    const hair = el('line', {y1: M.t, y2: H-M.b, stroke: css('--text-muted'),
                             'stroke-width': 1, opacity: 0}, svg);
    const hit = el('rect', {x: M.l, y: M.t, width: W-M.l-M.r, height: H-M.t-M.b,
                            fill: 'transparent'}, svg);
    hit.addEventListener('pointermove', ev => {
      const r = svg.getBoundingClientRect();
      const mx = ev.clientX - r.left;
      let best = xs[0], bd = 1e18;
      for (const x of xs) { const d = Math.abs(X(x)-mx); if (d < bd) {bd = d; best = x;} }
      hair.setAttribute('x1', X(best)); hair.setAttribute('x2', X(best));
      hair.setAttribute('opacity', 0.6);
      while (tip.firstChild) tip.removeChild(tip.firstChild);
      const tt = el('div', {class: 't-title'}, tip);
      tt.textContent = best.replace('T', ' ').slice(0, 19);
      spec.series.forEach((s, i) => {
        if (!on[i]) return;
        const p = s.points.find(q => q.x === best);
        if (!p) return;
        const row = el('div', {class: 'row'}, tip);
        const lk = el('span', {class: 'lk'}, row);
        lk.style.background = css(SERIES_VARS[i % 3]);
        const v = el('span', {class: 'v'}, row);
        v.textContent = fmt(p.y, 3) + (spec.unit ? ' ' + spec.unit : '');
        const k = el('span', {class: 'k'}, row);
        k.textContent = s.name + (p.meta ? ' · ' + p.meta : '');
      });
      tip.style.display = 'block';
      const cr = card.getBoundingClientRect();
      tip.style.left = Math.min(ev.clientX - cr.left + 14, card.clientWidth - 260) + 'px';
      tip.style.top = (ev.clientY - cr.top + 10) + 'px';
    });
    hit.addEventListener('pointerleave', () => {
      tip.style.display = 'none'; hair.setAttribute('opacity', 0);
    });
  }
  draw();
}

// ---------- bar chart with per-mark tooltip ----------
function barChart(card, spec) {
  // spec: {cats: [..], values: [..], unit, log}
  const W = Math.min(card.clientWidth - 8, 960),
        H = 240, M = {l: 64, r: 12, t: 10, b: 46};
  const svg = el('svg', {width: W, height: H, role: 'img'}, card);
  const tip = el('div', {class: 'tooltip'}, card);
  const n = spec.cats.length;
  const vmax = Math.max(...spec.values, 0);
  const Y = v => H - M.b - (vmax ? v/vmax : 0) * (H-M.t-M.b);
  for (const t of niceTicks(0, vmax)) {
    el('line', {x1: M.l, x2: W-M.r, y1: Y(t), y2: Y(t),
                stroke: css('--grid'), 'stroke-width': 1}, svg);
    el('text', {x: M.l-6, y: Y(t)+4, 'text-anchor': 'end'}, svg)
        .textContent = fmt(t, 3);
  }
  const band = (W-M.l-M.r)/n, bw = Math.min(24, band-2);
  spec.cats.forEach((c, i) => {
    const x = M.l + band*i + (band-bw)/2, y = Y(spec.values[i]),
          h = Math.max(H-M.b-y, 0);
    const r = Math.min(4, bw/2, h);
    // 4px rounded data-end, square baseline
    const d = `M${x},${H-M.b} L${x},${y+r} Q${x},${y} ${x+r},${y} ` +
        `L${x+bw-r},${y} Q${x+bw},${y} ${x+bw},${y+r} L${x+bw},${H-M.b} Z`;
    const bar = el('path', {d, fill: css('--series-1')}, svg);
    const hit = el('rect', {x: M.l + band*i, y: M.t, width: band,
                            height: H-M.t-M.b, fill: 'transparent'}, svg);
    const show = ev => {
      bar.setAttribute('opacity', 0.8);
      while (tip.firstChild) tip.removeChild(tip.firstChild);
      const row = el('div', {class: 'row'}, tip);
      const v = el('span', {class: 'v'}, row);
      v.textContent = fmt(spec.values[i], 4) + (spec.unit ? ' '+spec.unit : '');
      const k = el('span', {class: 'k'}, row);
      k.textContent = c;
      tip.style.display = 'block';
      const cr = card.getBoundingClientRect();
      tip.style.left = Math.min(ev.clientX - cr.left + 14, card.clientWidth - 220) + 'px';
      tip.style.top = (ev.clientY - cr.top + 10) + 'px';
    };
    hit.addEventListener('pointermove', show);
    hit.addEventListener('pointerleave', () => {
      bar.setAttribute('opacity', 1); tip.style.display = 'none';
    });
    const lbl = el('text', {x: M.l + band*i + band/2, y: H - M.b + 14,
        'text-anchor': 'end',
        transform: `rotate(-30 ${M.l + band*i + band/2} ${H-M.b+14})`}, svg);
    lbl.textContent = c;
  });
}

function tableView(card, header, rows) {
  const btn = el('button', {class: 'tbl-toggle', type: 'button'}, card);
  btn.textContent = 'table view';
  const tbl = el('table', {class: 'hidden'}, card);
  const tr = el('tr', {}, tbl);
  header.forEach(h => el('th', {}, tr).textContent = h);
  rows.forEach(r => {
    const row = el('tr', {}, tbl);
    r.forEach(c => el('td', {}, row).textContent = c == null ? '–' : String(c));
  });
  btn.onclick = () => tbl.classList.toggle('hidden');
}

// ---------- page assembly ----------
const snapSel = document.getElementById('snapSel');
for (const name of Object.keys(DATA.func_snapshots)) {
  const o = document.createElement('option');
  o.value = name; o.textContent = name; snapSel.appendChild(o);
}
snapSel.onchange = render;
document.getElementById('artifactToggle').onchange = render;

function render() {
  const tiles = document.getElementById('tiles');
  const charts = document.getElementById('charts');
  tiles.textContent = ''; charts.textContent = '';
  const showArtifacts = document.getElementById('artifactToggle').checked;

  const honest = DATA.history.filter(r => r.honest);
  const latest = {};
  for (const r of honest) latest[r.metric] = r;  // last wins (sorted by append)
  for (const [metric, r] of Object.entries(latest)) {
    const tile = el('div', {class: 'tile'}, tiles);
    el('div', {class: 'label'}, tile).textContent =
        metric.replace(/_/g, ' ').replace(' private inference throughput', '');
    el('div', {class: 'value'}, tile).textContent = fmt(r.tokps, 1) + ' tok/s';
    el('div', {class: 'delta'}, tile).textContent =
        `${fmt(r.vs_baseline, 0)}x reference · seq ${r.seq} · ` +
        `${fmt(r.latency_sec, 3)}s/fwd · ${r.backend}`;
  }

  // headline time series, one series per (metric, seq)
  const runs = DATA.history.filter(r => (r.honest || showArtifacts) && r.tokps != null);
  const groups = {};
  for (const r of runs) {
    const key = `${r.metric.split('_')[0]} seq${r.seq}` +
        (r.honest ? '' : ' (artifact)');
    (groups[key] = groups[key] || []).push(
        {x: r.ts, y: r.tokps, meta: `${fmt(r.latency_sec,3)}s/fwd, ${r.backend}`});
  }
  const names = Object.keys(groups).slice(0, 3);  // 3-slot all-pairs-safe cap
  if (names.length) {
    const card = el('div', {class: 'card'}, charts);
    el('h2', {}, card).textContent = 'Headline throughput over runs';
    el('p', {class: 'note'}, card).textContent =
        'tokens/sec, honest device-synchronized timing' +
        (showArtifacts ? ' + pre-fix artifact runs' : '') +
        (Object.keys(groups).length > 3 ?
         ` (${Object.keys(groups).length - 3} more series in table view)` : '');
    lineChart(card, {unit: 'tok/s', yLabel: 'tokens per second',
      series: names.map(n => ({name: n, points: groups[n]}))});
    tableView(card, ['time', 'series', 'tok/s', 'latency s', 'compile s'],
      runs.map(r => [r.ts.slice(0, 19), `${r.metric.split('_')[0]} seq${r.seq}`,
                     fmt(r.tokps, 2), fmt(r.latency_sec, 4), fmt(r.compile_sec, 0)]));
  }

  // compile-time series
  if (runs.some(r => r.compile_sec != null)) {
    const card = el('div', {class: 'card'}, charts);
    el('h2', {}, card).textContent = 'Compile time over runs';
    el('p', {class: 'note'}, card).textContent =
        'seconds per program build (persistent-cache hits are fast)';
    lineChart(card, {unit: 's', yLabel: 'compile seconds',
      series: names.map(n => ({name: n, points:
        DATA.history.filter(r => (r.honest || showArtifacts) &&
            `${r.metric.split('_')[0]} seq${r.seq}` +
            (r.honest ? '' : ' (artifact)') === n && r.compile_sec != null)
          .map(r => ({x: r.ts, y: r.compile_sec}))})).filter(s => s.points.length)});
  }

  // function benchmarks from selected snapshot
  const snap = DATA.func_snapshots[snapSel.value || Object.keys(DATA.func_snapshots)[0]];
  if (snap) {
    const cats = Object.keys(snap);
    const card1 = el('div', {class: 'card'}, charts);
    el('h2', {}, card1).textContent = 'Per-function encrypted runtime';
    el('p', {class: 'note'}, card1).textContent =
        'median ms per call, compiled 2-party path';
    barChart(card1, {cats, values: cats.map(c => snap[c].median_ms), unit: 'ms'});
    tableView(card1, ['function', 'median ms', 'q1', 'q3'],
      cats.map(c => [c, fmt(snap[c].median_ms, 2), fmt(snap[c].q1_ms, 2),
                     fmt(snap[c].q3_ms, 2)]));

    const card2 = el('div', {class: 'card'}, charts);
    el('h2', {}, card2).textContent = 'Approximation error (avg abs)';
    el('p', {class: 'note'}, card2).textContent =
        'average |enc - float| over the reference domains; relative error ' +
        'in the table (see results/README_errors.md for the gelu note)';
    barChart(card2, {cats, values: cats.map(c => snap[c].avg_abs_err)});
    tableView(card2, ['function', 'avg abs', 'total abs', 'avg rel'],
      cats.map(c => [c, fmt(snap[c].avg_abs_err, 5), fmt(snap[c].total_abs_err, 3),
                     fmt(snap[c].avg_rel_err, 4)]));
  }
}
render();
</script>
</body>
</html>
"""


if __name__ == "__main__":
    main()
