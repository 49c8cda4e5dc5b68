"""osmChange 0.6 XML sink (S13).

Serializes a change DataFrame — the Spawner's create-node suggestions and
Validator tag edits — into osmChange XML documents, the format the
reference emits from its editing pipeline (Core/Change/OsmChange.cs:49-130).

The XML body for each element is built NATIVELY as a string column
(concat/escape expressions), so serialization scales with the cluster;
only the final document assembly (header + concatenated bodies) collects —
osmChange files are per-changeset and inherently small. For bulk export,
`write_osmchange_files` writes one XML document per spark partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEADER = '<?xml version="1.0" encoding="UTF-8"?>\n<osmChange version="0.6" generator="osmalyzer_spark">\n'
_FOOTER = "</osmChange>\n"


def _xml_escape(c: Column) -> Column:
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    c = F.replace(c, F.lit('"'), F.lit("&quot;"))
    return c


def node_xml_expr(
    action: str,
    node_id,
    lat,
    lon,
    tags,
    version=None,
) -> Column:
    """One <create>/<modify>/<delete> block for a node with a tags map."""
    nid = node_id if isinstance(node_id, Column) else F.col(node_id)
    la = lat if isinstance(lat, Column) else F.col(lat)
    lo = lon if isinstance(lon, Column) else F.col(lon)
    tg = tags if isinstance(tags, Column) else F.col(tags)
    ver = (
        (version if isinstance(version, Column) else F.col(version))
        if version is not None
        else F.lit(1)
    )
    tag_lines = F.concat_ws(
        "",
        F.transform(
            F.map_entries(F.coalesce(tg, F.expr("map()"))),
            lambda e: F.concat(
                F.lit('    <tag k="'),
                _xml_escape(e["key"]),
                F.lit('" v="'),
                _xml_escape(e["value"]),
                F.lit('"/>\n'),
            ),
        ),
    )
    node = F.concat(
        F.lit(f"  <node id=\""),
        nid.cast("string"),
        F.lit('" version="'),
        ver.cast("string"),
        F.lit('" lat="'),
        F.format_number(la, 7),
        F.lit('" lon="'),
        F.format_number(lo, 7),
        F.lit('">\n'),
        tag_lines,
        F.lit("  </node>\n"),
    )
    return F.concat(F.lit(f" <{action}>\n"), node, F.lit(f" </{action}>\n"))


def spawner_to_osmchange(suggestions: DataFrame) -> str:
    """Spawner create-node suggestions -> one osmChange XML document.
    suggestions: (item_id, lat, lon, suggested_tags map). New nodes get
    negative placeholder ids (editor convention)."""
    from pyspark.sql import Window

    w = Window.orderBy("item_id")
    with_ids = suggestions.withColumn("new_id", -F.row_number().over(w))
    bodies = with_ids.select(
        node_xml_expr("create", "new_id", "lat", "lon", "suggested_tags").alias("xml")
    ).collect()
    return _HEADER + "".join(r["xml"] for r in bodies) + _FOOTER


def write_osmchange_files(blocks: DataFrame, xml_col: str, out_dir: str) -> None:
    """Bulk export: one osmChange document per partition (each a valid
    standalone file), written through the text datasource."""
    import pandas as pd

    def wrap(batches):
        chunks = []
        for pdf in batches:
            chunks.append("".join(pdf[xml_col]))
        yield pd.DataFrame({"value": [_HEADER + "".join(chunks) + _FOOTER]})

    blocks.select(xml_col).mapInPandas(wrap, schema="value string").write.mode(
        "overwrite"
    ).text(out_dir)
