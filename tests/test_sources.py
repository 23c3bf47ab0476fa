"""Source-layer tests: discovery, metadata, schema alignment/evolution,
header remap + id synthesis, REST cursor source, salted join, sketches."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from importer_spark.io import normalize_column_name, normalize_columns
from importer_spark.operators.skew import salted_join
from importer_spark.sources import (
    RestCursorSource,
    align_to_schema,
    discover_files,
    with_ingest_metadata,
)
from importer_spark.sources.files import (
    filename_date,
    read_evolving_parquet,
    remap_headers,
    synthesize_lead_id,
)
from tests.conftest import SF_DIR


def test_filename_date_formats():
    assert filename_date("export_01-31-2024.xlsx") == "2024-01-31"
    assert filename_date("items-2024-02-15.jsonl") == "2024-02-15"
    assert filename_date("seed_items.xlsx") is None


def test_discover_files_ordering_and_latest(tmp_path):
    for name in ["b_01-15-2024.csv", "a_2024-03-01.csv", "seed.csv"]:
        (tmp_path / name).write_text("x")
    found = discover_files(str(tmp_path / "*.csv"))
    assert [f.file_date for f in found] == [None, "2024-01-15", "2024-03-01"]
    latest = discover_files(str(tmp_path / "*.csv"), latest_only=True)
    assert latest[0].file_date == "2024-03-01"


def test_ingest_metadata_and_column_normalization(spark):
    df = spark.createDataFrame([Row(**{"Total Amount": 1})])
    named = normalize_columns(df)
    assert named.columns == ["total_amount"]
    out = with_ingest_metadata(
        named, snapshot_date="2024-01-31", is_seed=True, worksheet_name="Item",
        load_date="2024-02-01",
    )
    row = out.first()
    assert (row.load_date, row.snapshot_date, row.is_seed, row.worksheet_name) == (
        "2024-02-01", "2024-01-31", True, "Item",
    )


def test_normalize_column_name_rules():
    assert normalize_column_name(" Product/Service Amount ") == "product_service_amount"
    assert normalize_column_name("Qty.On.Hand") == "qtyonhand"


def test_align_to_schema_pads_and_orders(spark):
    df = spark.createDataFrame([Row(b="x", a=1)])
    out = align_to_schema(df, {"a": "bigint", "b": "string", "c": "double"})
    assert out.columns == ["a", "b", "c"]
    row = out.first()
    assert row.c is None and dict(out.dtypes)["c"] == "double"


def test_union_after_alignment(spark):
    inv = spark.createDataFrame([Row(order_no="I1", terms="NET30")])
    rec = spark.createDataFrame([Row(order_no="R1", payment="card")])
    target = {"order_no": "string", "terms": "string", "payment": "string"}
    unioned = align_to_schema(inv, target).unionByName(align_to_schema(rec, target))
    rows = {r.order_no: (r.terms, r.payment) for r in unioned.collect()}
    assert rows == {"I1": ("NET30", None), "R1": (None, "card")}


def test_remap_and_lead_id_synthesis(spark):
    df = spark.createDataFrame(
        [
            Row(**{"First Name": "Ada", "Last Name": "L", "Email": "a@x.co",
                   "Company": "X", "lead_id": ""}),
            Row(**{"First Name": "Bo", "Last Name": "K", "Email": "b@y.co",
                   "Company": "Y", "lead_id": "L-7"}),
        ]
    )
    out = synthesize_lead_id(remap_headers(df))
    ids = {r.email: r.lead_id for r in out.collect()}
    assert ids["b@y.co"] == "L-7"
    assert ids["a@x.co"].startswith("gen_") and len(ids["a@x.co"]) == 20
    # Deterministic: same inputs → same synthetic id.
    again = synthesize_lead_id(remap_headers(df))
    assert {r.lead_id for r in again.collect()} == set(ids.values())


def test_read_evolving_parquet_merges_schema(spark, tmp_path):
    p1, p2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    spark.createDataFrame([Row(id=1, name="a")]).write.parquet(p1)
    spark.createDataFrame([Row(id=2, name="b", new_col=3.5)]).write.parquet(p2)
    merged = read_evolving_parquet(spark, [p1, p2])
    assert set(merged.columns) == {"id", "name", "new_col"}
    vals = {r.id: r.new_col for r in merged.collect()}
    assert vals[1] is None and vals[2] == 3.5


def test_rest_cursor_source_pagination(spark):
    data = [
        {"id": i, "updated_at": f"2024-01-{i:02d}"} for i in range(1, 8)
    ]

    def fetch(cursor, page_size):
        rows = [r for r in data if cursor is None or r["updated_at"] > cursor]
        return rows[:3]

    src = RestCursorSource(spark, fetch, page_size=3)
    full = src.load()
    assert full.count() == 7
    incr = src.load(cursor="2024-01-05")
    assert sorted(r.id for r in incr.collect()) == [6, 7]


def _write_minimal_xlsx(path, sheets):
    """Build a real .xlsx with the stdlib: zip + SpreadsheetML XML. Exercises
    shared strings, inline strings, numeric cells, and sparse rows — the
    shapes the reference's QuickBooks/trade-show exports contain."""
    import zipfile

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    all_strings: list = []

    def sref(s):
        if s not in all_strings:
            all_strings.append(s)
        return all_strings.index(s)

    sheet_xmls = {}
    for si, (name, rows) in enumerate(sheets.items(), start=1):
        body = []
        for ri, row in enumerate(rows, start=1):
            cells = []
            for ci, val in enumerate(row):
                if val is None:
                    continue
                col = chr(ord("A") + ci)
                if isinstance(val, (int, float)):
                    cells.append(f'<c r="{col}{ri}"><v>{val}</v></c>')
                elif ri == 1:
                    cells.append(f'<c r="{col}{ri}" t="s"><v>{sref(val)}</v></c>')
                else:
                    cells.append(
                        f'<c r="{col}{ri}" t="inlineStr"><is><t>{val}</t></is></c>'
                    )
            body.append(f'<row r="{ri}">{"".join(cells)}</row>')
        sheet_xmls[f"xl/worksheets/sheet{si}.xml"] = (
            f'<worksheet {ns}><sheetData>{"".join(body)}</sheetData></worksheet>'
        )
    sheet_tags = "".join(
        f'<sheet name="{name}" sheetId="{i}" xmlns:r="{rns}" r:id="rId{i}"/>'
        for i, name in enumerate(sheets, start=1)
    )
    rel_tags = "".join(
        f'<Relationship Id="rId{i}" Type="{rns}/worksheet" '
        f'Target="worksheets/sheet{i}.xml"/>'
        for i in range(1, len(sheets) + 1)
    )
    sst = "".join(f"<si><t>{s}</t></si>" for s in all_strings)
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", f"<workbook {ns}><sheets>{sheet_tags}</sheets></workbook>")
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + rel_tags
            + "</Relationships>",
        )
        z.writestr("xl/sharedStrings.xml", f"<sst {ns}>{sst}</sst>")
        for p_, xml in sheet_xmls.items():
            z.writestr(p_, xml)


def test_read_xlsx_stdlib_parser(spark, tmp_path):
    """S1 ungated: the stdlib SpreadsheetML reader round-trips a real xlsx
    (shared-string header, inline-string + numeric + missing cells, named
    second sheet)."""
    from importer_spark.sources import read_xlsx
    from importer_spark.sources.files import remap_headers

    path = str(tmp_path / "leads.xlsx")
    _write_minimal_xlsx(
        path,
        {
            "Leads": [
                ["First Name", "Last Name", "Email", "Score"],
                ["Ada", "Lovelace", "ada@example.com", 97],
                ["Alan", None, "alan@example.com", 85.5],
            ],
            "Notes": [["Note"], ["second sheet"]],
        },
    )
    df = read_xlsx(spark, path)
    assert df.columns == ["First Name", "Last Name", "Email", "Score"]
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [
        ("Ada", "Lovelace", "ada@example.com", "97"),
        ("Alan", None, "alan@example.com", "85.5"),
    ]
    # header remap (S11) composes directly on the ingested frame
    assert remap_headers(df).columns[:3] == ["first_name", "last_name", "email"]
    # named-sheet selection via workbook rels
    notes = read_xlsx(spark, path, sheet="Notes")
    assert notes.columns == ["Note"]
    assert [r[0] for r in notes.collect()] == ["second sheet"]
    with pytest.raises(ValueError, match="not found"):
        read_xlsx(spark, path, sheet="Nope")


def test_salted_join_matches_plain_join(spark):
    from importer_spark.io import Tables

    t = Tables(spark, SF_DIR)
    plain = (
        t.orders.join(t.customer, t.orders.o_custkey == t.customer.c_custkey)
        .groupBy("c_mktsegment")
        .count()
    )
    salted = (
        salted_join(
            t.orders,
            t.customer.withColumnRenamed("c_custkey", "o_custkey"),
            on=["o_custkey"],
        )
        .groupBy("c_mktsegment")
        .count()
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_approx_sketch_error_bound(spark):
    """HLL estimate within 5% of the exact distinct count per segment. The
    exact side lives HERE, not in the query — at scale the sketch exists so
    you never pay countDistinct."""
    from pyspark.sql import functions as F

    from importer_spark.io import Tables
    from importer_spark.queries import DIAGNOSTICS

    df = DIAGNOSTICS["approx_distinct_sketch"](spark, SF_DIR).toPandas().set_index("mktsegment")
    t = Tables(spark, SF_DIR)
    exact = (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .toPandas()
        .set_index("c_mktsegment")["n"]
    )
    rel_err = (df.approx_customers - exact).abs() / exact
    assert (rel_err < 0.05).all(), (df, exact)


def test_read_xlsx_data_wider_than_header(spark, tmp_path):
    """Data in columns with a blank header cell must survive (col_{i}
    naming), not be silently truncated."""
    from importer_spark.sources import read_xlsx

    path = str(tmp_path / "wide.xlsx")
    _write_minimal_xlsx(
        path,
        {"S": [["A", "B"], ["x", "y", "stray"]]},
    )
    df = read_xlsx(spark, path)
    assert df.columns == ["A", "B", "col_2"]
    assert [tuple(r) for r in df.collect()] == [("x", "y", "stray")]


# ---------------------------------------------------------------------------
# GraphQL cursor source (reference shopify_dlt/__init__.py:168-228,
# helpers.py:127-146: run query → JSONPath items + cursor → re-run with
# cursor piped into a variable)
# ---------------------------------------------------------------------------


def _gql_fake_transport(pages):
    """Build a transport serving `pages` (lists of node dicts) in the
    Shopify edges/cursor envelope, recording each call's variables."""
    calls = []

    def execute(query, variables):
        calls.append(dict(variables))
        after = variables.get("after")
        idx = 0 if after is None else int(after.split(":")[1]) + 1
        nodes = pages[idx] if idx < len(pages) else []
        return {
            "data": {
                "transactions": {
                    "edges": [
                        {"cursor": f"c:{idx}", "node": n} for n in nodes
                    ]
                }
            }
        }

    return execute, calls


def test_graphql_source_paginates_and_threads_cursor(spark):
    from importer_spark.sources import GraphQLCursorSource

    pages = [
        [{"id": 1, "amount": 10}, {"id": 2, "amount": 20}],
        [{"id": 3, "amount": 30}],
        [],
    ]
    execute, calls = _gql_fake_transport(pages)
    src = GraphQLCursorSource(
        spark,
        execute,
        query="query Transactions($after: String) { ... }",
        data_items_path="data.transactions.edges[*].node",
        pagination_cursor_path="data.transactions.edges[-1].cursor",
    )
    df = src.load()
    rows = {r.id: r.amount for r in df.collect()}
    assert rows == {1: 10, 2: 20, 3: 30}
    # last page's cursor is carried for the state table
    assert df.select("_cursor").distinct().first()[0] == "c:1"
    # the cursor was piped back into the pagination variable each call
    assert [c.get("after") for c in calls] == [None, "c:0", "c:1"]


def test_graphql_source_empty_and_nonadvancing(spark):
    from importer_spark.sources import GraphQLCursorSource

    execute, _ = _gql_fake_transport([[]])
    src = GraphQLCursorSource(
        spark,
        execute,
        query="q",
        data_items_path="data.transactions.edges[*].node",
        pagination_cursor_path="data.transactions.edges[-1].cursor",
    )
    df = src.load(empty_schema="id bigint, amount bigint, _cursor string")
    assert df.count() == 0 and df.columns == ["id", "amount", "_cursor"]

    # a server that repeats the same cursor must terminate, not spin
    def stuck(query, variables):
        return {
            "data": {
                "transactions": {
                    "edges": [{"cursor": "same", "node": {"id": 1}}]
                }
            }
        }

    stuck_src = GraphQLCursorSource(
        spark,
        stuck,
        query="q",
        data_items_path="data.transactions.edges[*].node",
        pagination_cursor_path="data.transactions.edges[-1].cursor",
    )
    out = stuck_src.load()
    # the re-served page must NOT be ingested twice
    assert [r.id for r in out.collect()] == [1]


def test_extract_path_subset():
    from importer_spark.sources import extract_path

    data = {"a": {"b": [{"c": 1}, {"c": 2}]}}
    assert extract_path(data, "a.b[*].c") == [1, 2]
    assert extract_path(data, "a.b[-1].c") == [2]
    assert extract_path(data, "a.b[0].c") == [1]
    assert extract_path(data, "a.missing[*].c") == []
    assert extract_path(data, "a.b[5].c") == []
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported JSONPath"):
        extract_path(data, "a.b[foo].c")


def test_read_csv_with_rejects(spark, tmp_path):
    """Typed rows parse; malformed rows land in the reject frame with the
    raw line preserved (dlt bad-record behavior, not FAILFAST/not silent)."""
    from importer_spark.io import read_csv_with_rejects

    p = tmp_path / "in.csv"
    p.write_text(
        "id,amount,day\n"
        "1,10.5,2024-01-02\n"
        "2,notanumber,2024-01-03\n"
        "3,7.25,2024-01-04\n"
    )
    good, rejects, release = read_csv_with_rejects(
        spark, str(p), "id INT, amount DOUBLE, day DATE"
    )
    assert sorted((r.id, r.amount) for r in good.collect()) == [(1, 10.5), (3, 7.25)]
    rej = [r.raw_line for r in rejects.collect()]
    assert rej == ["2,notanumber,2024-01-03"]
    release()  # unpersists the raw scan — no InMemoryRelation pinned per load
    release()  # idempotent



def test_read_csv_with_rejects_gzip(spark, tmp_path):
    """Compressed inputs read transparently (the .gz drop-zone case)."""
    import gzip

    from importer_spark.io import read_csv_with_rejects

    p = tmp_path / "in.csv.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("id,amount,day\n1,2.5,2024-05-06\nbad,row,x\n")
    good, rejects, release = read_csv_with_rejects(
        spark, str(p), "id INT, amount DOUBLE, day DATE"
    )
    assert [(r.id, r.amount) for r in good.collect()] == [(1, 2.5)]
    assert rejects.count() == 1
    release()


def test_read_xlsx_distributed_matches_driver_path(spark, tmp_path):
    """The binaryFile+mapInPandas many-workbook path (the 100 TB posture
    for S1) yields the same rows as the driver-side parser per file, in one
    distributed job, aligning drifted headers by name (missing -> null,
    extra -> dropped) and stamping source lineage."""
    from importer_spark.sources import read_xlsx, read_xlsx_distributed

    books = {
        "a.xlsx": [
            ["First Name", "Email", "Score"],
            ["Ada", "ada@example.com", 97],
            ["Alan", "alan@example.com", 85.5],
        ],
        # Header drift: reordered + an extra column + a missing one.
        "b.xlsx": [
            ["Email", "Extra", "First Name"],
            ["grace@example.com", "x", "Grace"],
        ],
        "c.xlsx": [
            ["First Name", "Email", "Score"],
            ["Edsger", "ew@example.com", 72],
        ],
    }
    for name, rows in books.items():
        _write_minimal_xlsx(str(tmp_path / name), {"Leads": rows})

    dist = read_xlsx_distributed(
        spark, str(tmp_path / "*.xlsx"), columns=["First Name", "Email", "Score"]
    )
    assert dist.columns == ["First Name", "Email", "Score", "_source_file"]
    got = sorted(
        (r["First Name"], r["Email"], r["Score"], r["_source_file"].rsplit("/", 1)[-1])
        for r in dist.collect()
    )
    assert got == [
        ("Ada", "ada@example.com", "97", "a.xlsx"),
        ("Alan", "alan@example.com", "85.5", "a.xlsx"),
        ("Edsger", "ew@example.com", "72", "c.xlsx"),
        ("Grace", "grace@example.com", None, "b.xlsx"),
    ]
    # Per-file parity with the driver parser on the no-drift books.
    for name in ("a.xlsx", "c.xlsx"):
        drv = sorted(tuple(r) for r in read_xlsx(spark, str(tmp_path / name)).collect())
        d = sorted(
            (r["First Name"], r["Email"], r["Score"])
            for r in dist.collect()
            if r["_source_file"].endswith(name)
        )
        assert d == [tuple(x) for x in drv]


def test_read_xlsx_distributed_probes_schema(spark, tmp_path):
    """With no explicit columns, the target schema probes from the first
    workbook by path order (one small file read, never the corpus)."""
    from importer_spark.sources import read_xlsx_distributed

    _write_minimal_xlsx(
        str(tmp_path / "x1.xlsx"),
        {"S": [["A", "B"], ["1", "2"]]},
    )
    _write_minimal_xlsx(
        str(tmp_path / "x2.xlsx"),
        {"S": [["A", "B"], ["3", "4"]]},
    )
    df = read_xlsx_distributed(spark, str(tmp_path / "*.xlsx"))
    assert df.columns == ["A", "B", "_source_file"]
    assert sorted((r.A, r.B) for r in df.collect()) == [("1", "2"), ("3", "4")]
