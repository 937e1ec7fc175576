"""Structure tree parity with the reference's test expectations
(tests/test_structure.py ports that are runnable offline)."""

import json
import re

import pdfplumber_spark.api as pdfplumber
from pdfplumber_spark.kernel.pdfparse import PDFDocument
from pdfplumber_spark.kernel.structure import StructTree, tree_to_json

PDFS = "/root/reference/tests/pdfs"


def test_structure_tree_class_image():
    # reference test_structure.py:860-866
    with pdfplumber.open(f"{PDFS}/image_structure.pdf") as pdf:
        stree = pdf.structure_tree(page_number=1)
        doc_elem = next(iter(stree))
        assert [k.type for k in doc_elem] == ["P", "P", "Figure"]


def test_find_all_tree():
    # reference test_structure.py:867-889
    with pdfplumber.open(f"{PDFS}/image_structure.pdf") as pdf:
        stree = pdf.structure_tree(page_number=1)
        figs = list(stree.find_all("Figure"))
        assert len(figs) == 1
        assert stree.find("Figure") is figs[0]
        assert stree.find("Fogure") is None
        assert len(list(stree.find_all(re.compile(r"Fig.*")))) == 1
        assert len(list(stree.find_all(lambda x: x.type == "Figure"))) == 1
        assert len(list(stree.find_all("Foogure"))) == 0


def test_find_all_element():
    # reference test_structure.py:890-906
    with pdfplumber.open(f"{PDFS}/pdf_structure.pdf") as pdf:
        stree = pdf.structure_tree()
        found = 0
        for list_elem in stree.find_all("L"):
            items = list(list_elem.find_all("LI"))
            assert items
            for item in items:
                body = list(item.find_all("LBody"))
                assert body
                assert item.find("LBody") is body[0]
                assert item.find("Loonie") is None
            found += 1
        assert found >= 1


def test_all_mcids_page_scoping():
    # reference test_structure.py:907-933
    doc = PDFDocument(open(f"{PDFS}/2023-06-20-PV.pdf", "rb").read())
    stree = StructTree(doc)
    sect = next(stree.find_all("Sect"))
    pages = set(p for p, m in sect.all_mcids())
    assert 1 in pages and 2 in pages
    scoped = StructTree(doc, page_number=2)
    sect2 = next(scoped.find_all("Sect"))
    assert set(p for p, m in sect2.all_mcids()) == {None}


def test_tree_to_json_and_spark_plan(spark, tmp_path):
    data = open(f"{PDFS}/hello_structure.pdf", "rb").read()
    tree = json.loads(tree_to_json(data))
    assert tree and tree[0]["type"]

    # Spark column form over a mini corpus embedding this payload
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.Table.from_pylist(
        [{"url": "u1", "warc_ts": None, "html": data, "text": None, "lang": "en"}],
        schema=pa.schema(
            [("url", pa.string()), ("warc_ts", pa.timestamp("us", tz="UTC")),
             ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string())]
        ),
    )
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    from pdfplumber_spark.plans.extract import extract_structure, read_pages

    out = extract_structure(read_pages(spark, p), num_partitions=2).toPandas()
    assert len(out) == 1
    assert json.loads(out["structure_json"].iloc[0])[0]["type"]
