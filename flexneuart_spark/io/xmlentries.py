"""Legacy series-of-XML data-entry reader (SURVEY.md §2 S1; reference
``utils/DataEntryReader.java:33-46`` — ``.txt`` (optionally .gz/.bz2)
files holding a stream of two-level XML entries ``<DOC><FIELD>text
</FIELD>...</DOC>``, each entry starting on its own line —
``utils/XmlHelper.java:194-224``).

Spark-first shape: the file is split into entries by reading with the
closing tag as the record separator (``lineSep`` — splittable text scan,
no whole-file buffering), then each fragment is parsed with ElementTree
inside an Arrow-batched pandas UDF. Values are strings only, exactly the
reference's XML restriction."""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _parse_fragment(fragment: str, doc_tag: str) -> str | None:
    m = re.search(rf"<{doc_tag}[\s>]", fragment)
    if not m:
        return None  # trailing whitespace after the last entry
    xml_text = fragment[m.start() :] + f"</{doc_tag}>"
    root = ET.fromstring(xml_text)
    out = {child.tag: (child.text or "").strip() for child in root}
    return json.dumps(out)


def read_xml_entries(spark: SparkSession, path: str, doc_tag: str = "DOC") -> DataFrame:
    """Read a series-of-XML entry file → DataFrame (one column per field,
    schema inferred). Unparsable/empty trailing fragments are dropped."""
    raw = spark.read.option("lineSep", f"</{doc_tag}>").text(path)

    @F.pandas_udf("string")
    def parse(frags: pd.Series) -> pd.Series:
        return frags.map(lambda s: _parse_fragment(s, doc_tag) if s and s.strip() else None)

    js = raw.select(parse(F.col("value")).alias("j")).filter(F.col("j").isNotNull())
    return spark.read.json(js.rdd.map(lambda r: r.j))
