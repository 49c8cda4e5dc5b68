"""HTML/Leaflet report sink (S11).

Reference: Osmalyzer/Reporting/HtmlFileReportWriter.cs (+ templates,
EmbeddedIcons.cs) — each analyzer's correlation report renders to a
static HTML page with a Leaflet map of the matched/unmatched/lone
markers and a summary. This emitter produces the same artifact from a
correlations DataFrame (the six-kind shape of
CorrelationResult.correlations): per-kind colored circle markers with
popups, a per-kind summary table, and escaped text throughout.

Reports are human artifacts and bounded by contract (an analyzer report
with millions of rows is useless to a reader), so rows are collected on
the driver — cap enforced — while all upstream computation stays
distributed. The reference embeds icon PNGs; we use Leaflet circle
markers (no binary assets), served from the standard Leaflet CDN.
"""

from __future__ import annotations

import html
import json

from pyspark.sql import DataFrame

MAX_REPORT_ROWS = 50_000

KIND_COLORS = {
    "matched": "#2e7d32",
    "matched_far": "#f9a825",
    "unmatched_item": "#c62828",
    "unmatched_osm": "#6a1b9a",
    "lone_osm": "#1565c0",
    "outside_bounds": "#616161",
}

_PAGE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8"/>
<title>{title}</title>
<link rel="stylesheet" href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>
<script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
<style>
  body {{ font-family: sans-serif; margin: 1em; }}
  #map {{ height: 70vh; border: 1px solid #999; }}
  table {{ border-collapse: collapse; margin: 1em 0; }}
  td, th {{ border: 1px solid #ccc; padding: 0.3em 0.8em; text-align: left; }}
</style>
</head>
<body>
<h1>{title}</h1>
<table>
<tr><th>kind</th><th>count</th></tr>
{summary_rows}
</table>
<div id="map"></div>
<script>
var map = L.map('map');
var markers = {markers_json};
var colors = {colors_json};
var group = L.featureGroup();
markers.forEach(function(m) {{
  L.circleMarker([m.lat, m.lon], {{
    radius: 6, color: colors[m.kind] || '#000', fillOpacity: 0.7
  }}).bindPopup(m.popup).addTo(group);
}});
group.addTo(map);
if (markers.length) map.fitBounds(group.getBounds().pad(0.1));
else map.setView([56.95, 24.1], 7);
L.tileLayer('https://tile.openstreetmap.org/{{z}}/{{x}}/{{y}}.png',
            {{attribution: '&copy; OpenStreetMap contributors'}}).addTo(map);
</script>
</body>
</html>
"""


def render_leaflet_report(
    correlations: DataFrame,
    title: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_rows: int = MAX_REPORT_ROWS,
) -> str:
    """Correlations (kind, osm_id, item_id, distance, ... + lat/lon) ->
    complete standalone HTML page. Rows without coordinates appear in the
    summary only."""
    rows = correlations.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"report exceeds {max_rows} rows — reports are human artifacts; "
            "aggregate or filter upstream (all of which stays distributed)"
        )
    counts: dict[str, int] = {}
    markers = []
    for r in rows:
        kind = r["kind"]
        counts[kind] = counts.get(kind, 0) + 1
        lat = r[lat_col] if lat_col in r.__fields__ else None
        lon = r[lon_col] if lon_col in r.__fields__ else None
        if lat is None or lon is None:
            continue
        bits = [f"<b>{html.escape(str(kind))}</b>"]
        for k in ("osm_id", "item_id", "distance", "strength"):
            if k in r.__fields__ and r[k] is not None:
                bits.append(f"{html.escape(k)}: {html.escape(str(r[k]))}")
        markers.append(
            {
                "lat": float(lat),
                "lon": float(lon),
                "kind": str(kind),
                "popup": "<br/>".join(bits),
            }
        )
    summary = "\n".join(
        f"<tr><td>{html.escape(k)}</td><td>{n}</td></tr>"
        for k, n in sorted(counts.items())
    )
    return _PAGE.format(
        title=html.escape(title),
        summary_rows=summary,
        markers_json=json.dumps(markers),
        colors_json=json.dumps(KIND_COLORS),
    )


def write_report(correlations: DataFrame, path: str, title: str, **kwargs) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write(render_leaflet_report(correlations, title, **kwargs))
