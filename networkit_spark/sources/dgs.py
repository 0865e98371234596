"""DGS dynamic-graph-stream file reader.

Format (``cpp/io/DGSReader.cpp:15-126``, DGS004): magic line
``DGS004``; one header line (name, clock ticks, #events); then one
event per line:

- ``st``             — clock tick (advances the batch counter)
- ``an <name> [...]``— add node (names map to dense ids in
                       first-appearance order, like the reference's
                       ``nodeNames`` map)
- ``ae <ename> <from> <to>`` — add edge, weight 1.0
- ``ce <from>-<to> weight=<w>`` — set edge weight
- ``dn <name>``      — remove node
- ``de <from>-<to>`` — remove edge
- ``rn <name>``      — restore a removed node (NODE_RESTORATION,
                       ``cpp/dynamics/DGSStreamParser.cpp:112-116``)

The reader returns the EVENTS TABLE (``streaming/events.py``
EVENT_SCHEMA: batch, kind, u, v, w) plus the name→id mapping.  Parsing
is driver-side: DGS is an inherently sequential script (ids are
assigned by first appearance, ``st`` ticks order the batches), and
event scripts are driver-scale artifacts — the distributed object is
the events DataFrame this produces, which ``apply_events`` /
``incremental_components`` / ``incremental_pagerank`` consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from networkit_spark.streaming.events import (
    EDGE_ADDITION,
    EDGE_REMOVAL,
    EDGE_WEIGHT_UPDATE,
    EVENT_SCHEMA,
    NODE_ADDITION,
    NODE_REMOVAL,
    NODE_RESTORATION,
)


def read_dgs(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Returns ``(events, names)``: events per EVENT_SCHEMA, names as
    ``(name string, id long)``."""
    with open(path) as fh:
        first = fh.readline().strip()
        if first != "DGS004":
            raise ValueError(
                f"not a DGS004 file (first line {first!r}); the reference "
                "requires the magic cookie (DGSReader.cpp:29-33)"
            )
        fh.readline()  # header line: name / clock count / event count
        names: dict[str, int] = {}
        rows = []
        batch = 0

        def nid(name: str) -> int:
            if name not in names:
                names[name] = len(names)
            return names[name]

        for line in fh:
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "st":
                batch += 1
            elif tag == "an" and len(parts) >= 2:
                rows.append((batch, NODE_ADDITION, nid(parts[1]), -1, 0.0))
            elif tag == "ae" and len(parts) >= 4:
                rows.append((batch, EDGE_ADDITION, nid(parts[2]), nid(parts[3]), 1.0))
            elif tag == "ce" and len(parts) == 3:
                a, b = parts[1].split("-")
                w = float(parts[2].split("=")[1])
                rows.append((batch, EDGE_WEIGHT_UPDATE, nid(a), nid(b), w))
            elif tag == "dn" and len(parts) == 2:
                rows.append((batch, NODE_REMOVAL, nid(parts[1]), -1, 0.0))
            elif tag == "rn" and len(parts) == 2:
                rows.append((batch, NODE_RESTORATION, nid(parts[1]), -1, 0.0))
            elif tag == "de" and len(parts) == 2:
                a, b = parts[1].split("-")
                rows.append((batch, EDGE_REMOVAL, nid(a), nid(b), 0.0))

    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    names_df = spark.createDataFrame(
        [(k, v) for k, v in names.items()], "name string, id long"
    )
    return events, names_df


# Deterministic within-batch serialization order: nodes must be
# introduced before the edges that reference them (the reader's
# first-appearance id mapping), removals after the mutations they gate.
_KIND_PRIORITY = {
    NODE_ADDITION: 0,
    NODE_RESTORATION: 0,
    EDGE_ADDITION: 1,
    EDGE_WEIGHT_UPDATE: 2,
    EDGE_REMOVAL: 3,
    NODE_REMOVAL: 4,
}


def write_dgs(events: DataFrame, path: str, name: str = "g") -> None:
    """``DGSWriter`` counterpart: serialize an EVENT_SCHEMA DataFrame
    back to a DGS004 script.  Batches become ``st`` ticks; node ids are
    written as ``n<id>`` names (round-trips through :func:`read_dgs`'s
    first-appearance dense mapping when events introduce ids in
    ascending order).  Driver-side like the reader — an event script is
    a driver-scale artifact.

    Interop notes (DGSReader.cpp ``split.size() == 2`` guard): ``st``
    lines carry the tick number as an operand — the reference reader
    IGNORES bare ``st`` lines, so a 2-token form is required for the
    time-step boundaries to survive.  One ``st`` line is emitted per
    UNIT of batch-number delta (readers advance the clock by 1 per
    line), so gaps in batch numbers (0 then 2) are preserved.  Rows are
    ordered by (batch, kind-priority, u, v) so the script is
    deterministic under shuffle and ``an`` lines precede the ``ae``
    lines that reference them."""
    rows = events.collect()
    rows.sort(
        key=lambda r: (
            r["batch"],
            _KIND_PRIORITY.get(r["kind"], 9),
            r["u"],
            r["v"],
        )
    )
    n_events = len(rows)
    ticks = len({r["batch"] for r in rows})
    lines = ["DGS004", f"{name} {ticks} {n_events}"]
    last_batch = None
    for r in rows:
        if last_batch is not None and r["batch"] != last_batch:
            for t in range(int(last_batch) + 1, int(r["batch"]) + 1):
                lines.append(f"st {t}")
        last_batch = r["batch"]
        k = r["kind"]
        if k == NODE_ADDITION:
            lines.append(f"an n{r['u']}")
        elif k == NODE_REMOVAL:
            lines.append(f"dn n{r['u']}")
        elif k == NODE_RESTORATION:
            lines.append(f"rn n{r['u']}")
        elif k == EDGE_ADDITION:
            lines.append(f"ae e{r['u']}_{r['v']} n{r['u']} n{r['v']}")
        elif k == EDGE_REMOVAL:
            lines.append(f"de n{r['u']}-n{r['v']}")
        elif k == EDGE_WEIGHT_UPDATE:
            lines.append(f"ce n{r['u']}-n{r['v']} weight={r['w']}")
        # TIME_STEP markers are carried by the st lines between batches
    lines.append(f"st {int(last_batch) + 1 if rows else 0}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
