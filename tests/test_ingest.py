"""Golden ingest tests mirroring the reference's unit suite.

Each case cites the reference test it reproduces (FIXTURES.md §A2):
- happy path exact rows        csv/csv_test.go:24-95
- column-order independence    csv/csv_test.go:97-146
- short-row drop               csv/csv_test.go:148-163
- invalid date ⇒ row dropped   csv/csv_test.go:165-186 + datalake.go:225-233
- empty file ⇒ 0 rows          csv/csv_test.go:188-204
- `Post Date` alias            datalake/datalake_test.go:157-255
- balance default asymmetry    datalake/datalake.go:235-255
- filename extraction          datalake/datasource/datasource_test.go
"""

from __future__ import annotations

import os

from babylon_data_loader_spark.config import EngineConfig
from babylon_data_loader_spark.ingest import ingest
from babylon_data_loader_spark.ingest.normalize import (
    normalize_transactions,
    validate_transactions,
)
from babylon_data_loader_spark.sources.csv_source import read_csv_dir
from babylon_data_loader_spark.sources.parquet_lake import read_transactions

HEADER = "Details,Posting Date,Description,Category,Amount,Type,Balance,Check or Slip #"
ROW1 = 'DEBIT,01/01/2024,"WHOLEFDS HAR 102 230 B OAKLAND CA    211023  01/31",Shopping,-75.77,DEBIT_CARD,11190.76,'
ROW2 = 'CREDIT,01/02/2024,"ONLINE PAYMENT THANK YOU",Payment,1000.00,PAYMENT,10114.36,'


def write_csv(directory: str, name: str, lines: list[str]) -> str:
    path = os.path.join(directory, name)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + ("\n" if lines else ""))
    return path


def run_pipeline(spark, directory: str):
    raw = read_csv_dir(spark, directory)
    return validate_transactions(normalize_transactions(raw)).drop(
        "_input_file"
    )


def test_happy_path_exact_rows(spark, tmp_path):
    write_csv(str(tmp_path), "chase1234.csv", [HEADER, ROW1, ROW2])
    rows = {
        r["details"]: r.asDict()
        for r in run_pipeline(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {"DEBIT", "CREDIT"}
    debit = rows["DEBIT"]
    assert debit["posting_date"] == "01/01/2024"
    assert (
        debit["description"]
        == "WHOLEFDS HAR 102 230 B OAKLAND CA    211023  01/31"
    )
    assert debit["category"] == "Shopping"
    assert debit["amount"] == -75.77
    assert debit["type"] == "DEBIT_CARD"
    assert debit["balance"] == 11190.76
    assert debit["check_or_slip_num"] == ""
    assert debit["data_source"] == "chase"
    assert debit["account_id"] == "1234"
    credit = rows["CREDIT"]
    assert credit["amount"] == 1000.00
    assert credit["balance"] == 10114.36


def test_column_order_independence(spark, tmp_path):
    # csv/csv_test.go:97-146 — same data, different column order.
    reordered_header = "Amount,Description,Posting Date,Details,Category,Type,Balance,Check or Slip #"
    reordered_row = '-75.77,"WHOLEFDS HAR 102 230 B OAKLAND CA    211023  01/31",01/01/2024,DEBIT,Shopping,DEBIT_CARD,11190.76,'
    write_csv(str(tmp_path), "chase9999.csv", [reordered_header, reordered_row])
    row = run_pipeline(spark, str(tmp_path)).collect()[0].asDict()
    assert row["details"] == "DEBIT"
    assert row["amount"] == -75.77
    assert row["posting_date"] == "01/01/2024"


def test_short_row_dropped(spark, tmp_path):
    # csv/csv.go:82-84 — row with fewer fields than header disappears,
    # even though its present fields (incl. date+amount) are valid.
    short = "DEBIT,01/01/2024,desc,Shopping,-75.77"  # 5 of 8 fields
    write_csv(str(tmp_path), "chase1111.csv", [HEADER, ROW1, short])
    out = run_pipeline(spark, str(tmp_path))
    assert out.count() == 1


def test_empty_token_is_not_short_row(spark, tmp_path):
    # "a,b," has full arity with an empty last token — must be KEPT.
    full_with_empty = "DEBIT,01/01/2024,desc,Shopping,-75.77,DEBIT_CARD,,"
    write_csv(str(tmp_path), "chase1111.csv", [HEADER, full_with_empty])
    rows = run_pipeline(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["balance"] == 0.0  # empty balance defaults, row kept


def test_invalid_date_row_dropped(spark, tmp_path):
    # csv_test.go:165-186 + datalake.go:225-233.
    bad = 'DEBIT,InvalidDate,"x",Shopping,-75.77,DEBIT_CARD,1.0,'
    out_of_range = 'DEBIT,13/45/2024,"y",Shopping,-75.77,DEBIT_CARD,1.0,'
    write_csv(str(tmp_path), "chase1234.csv", [HEADER, ROW1, bad, out_of_range])
    out = run_pipeline(spark, str(tmp_path))
    assert out.count() == 1


def test_unpadded_date_accepted(spark, tmp_path):
    # Go time.Parse("01/02/2006") accepts "1/2/2024"; output re-pads.
    row = 'DEBIT,1/2/2024,"x",Shopping,-75.77,DEBIT_CARD,1.0,'
    write_csv(str(tmp_path), "chase1234.csv", [HEADER, row])
    rows = run_pipeline(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["posting_date"] == "01/02/2024"


def test_invalid_amount_row_dropped_but_bad_balance_kept(spark, tmp_path):
    # The P7-vs-P8 asymmetry (datalake.go:235-255).
    bad_amount = 'DEBIT,01/01/2024,"x",Shopping,notanumber,DEBIT_CARD,1.0,'
    bad_balance = 'DEBIT,01/03/2024,"y",Shopping,-5.25,DEBIT_CARD,notanumber,'
    write_csv(
        str(tmp_path), "chase1234.csv", [HEADER, bad_amount, bad_balance]
    )
    rows = run_pipeline(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["posting_date"] == "01/03/2024"
    assert rows[0]["amount"] == -5.25
    assert rows[0]["balance"] == 0.0


def test_go_float_surface(spark, tmp_path):
    # strconv.ParseFloat accepts 1e3 / +5 / .5 (datalake.go:236).
    lines = [
        HEADER,
        'A,01/01/2024,"a",c,1e3,T,1.0,',
        'B,01/01/2024,"b",c,+5,T,1.0,',
        'C,01/01/2024,"c",c,.5,T,1.0,',
    ]
    write_csv(str(tmp_path), "chase1234.csv", lines)
    rows = {
        r["details"]: r["amount"]
        for r in run_pipeline(spark, str(tmp_path)).collect()
    }
    assert rows == {"A": 1000.0, "B": 5.0, "C": 0.5}


def test_empty_file_and_header_only(spark, tmp_path):
    write_csv(str(tmp_path), "chase1234.csv", [])
    write_csv(str(tmp_path), "synthetic_h.csv", [HEADER])
    out = run_pipeline(spark, str(tmp_path))
    assert out.count() == 0


def test_post_date_alias(spark, tmp_path):
    # datalake_test.go:157-255 — `Post Date` header variant.
    header = "Details,Post Date,Description,Category,Amount,Type,Balance,Check or Slip #"
    write_csv(str(tmp_path), "chase4321.csv", [header, ROW1])
    rows = run_pipeline(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["posting_date"] == "01/01/2024"


def test_filename_extraction_and_rejection(spark, tmp_path):
    # datasource_test.go — chase/synthetic/unknown filename patterns.
    write_csv(str(tmp_path), "Chase5678Activity.CSV", [HEADER, ROW1])
    write_csv(str(tmp_path), "my_synthetic_data.csv", [HEADER, ROW2])
    write_csv(str(tmp_path), "mystery_bank.csv", [HEADER, ROW1])
    raw = read_csv_dir(spark, str(tmp_path))
    by_file = {
        os.path.basename(r["_input_file"]): (r["data_source"], r["account_id"])
        for r in raw.collect()
    }
    assert by_file["Chase5678Activity.CSV"] == ("chase", "5678")
    assert by_file["my_synthetic_data.csv"] == ("synthetic", "0000")
    assert by_file["mystery_bank.csv"] == (None, None)


def test_unknown_columns_dropped_missing_defaulted(spark, tmp_path):
    header = "Details,Posting Date,Amount,Wild Extra Column"
    row = "DEBIT,01/01/2024,-1.5,surprise"
    write_csv(str(tmp_path), "chase1234.csv", [header, row])
    rows = run_pipeline(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["category"] == ""
    assert r["description"] == ""
    assert r["balance"] == 0.0
    assert "wild extra column" not in r


def test_filename_with_spaces_ingests(spark, tmp_path):
    # input_file_name() percent-encodes the URI ('chase5678 export.csv'
    # → 'chase5678%20export.csv'); the header-removal join and per-file
    # stats must match on the DECODED basename or every row is silently
    # dropped (round-1 ADVICE, high).
    data_dir = tmp_path / "in"
    data_dir.mkdir()
    write_csv(str(data_dir), "chase5678 export.csv", [HEADER, ROW1, ROW2])
    rows = run_pipeline(spark, str(data_dir)).collect()
    assert len(rows) == 2
    assert {r["data_source"] for r in rows} == {"chase"}
    assert {r["account_id"] for r in rows} == {"5678"}

    cfg = EngineConfig(
        unprocessed_dir=str(data_dir),
        processed_dir=str(tmp_path / "done"),
        move_processed_files=False,
        lake_dir=str(tmp_path / "lake"),
    )
    result = ingest(spark, cfg)
    assert result.records_uploaded == 2
    assert result.processed_files == 1
    assert result.failed_files == 0


def test_full_ingest_idempotent(spark, tmp_path):
    # S7 idempotence: ingest twice ⇒ identical table state.
    data_dir = tmp_path / "in"
    lake_dir = tmp_path / "lake"
    data_dir.mkdir()
    write_csv(str(data_dir), "chase1234.csv", [HEADER, ROW1, ROW2])
    write_csv(str(data_dir), "notes.txt", ["not a csv"])
    cfg = EngineConfig(
        unprocessed_dir=str(data_dir),
        processed_dir=str(tmp_path / "done"),
        move_processed_files=False,
        lake_dir=str(lake_dir),
    )
    r1 = ingest(spark, cfg)
    assert r1.records_uploaded == 2
    assert r1.processed_files == 1
    assert r1.failed_files == 1  # the .txt
    state1 = sorted(
        tuple(r)
        for r in read_transactions(spark, cfg.transactions_path).collect()
    )
    r2 = ingest(spark, cfg)
    assert r2.records_uploaded == 2
    state2 = sorted(
        tuple(r)
        for r in read_transactions(spark, cfg.transactions_path).collect()
    )
    assert state1 == state2
    # sync_log accumulated two runs.
    assert spark.read.parquet(cfg.sync_log_path).count() == 2


def test_merge_same_key_collapses(spark, tmp_path):
    # Two rows equal on the 5-key, different amounts ⇒ ONE stored row,
    # deterministic survivor (max amount under our defined tiebreak).
    data_dir = tmp_path / "in"
    lake_dir = tmp_path / "lake"
    data_dir.mkdir()
    dup1 = 'DEBIT,01/01/2024,"same desc",c,-10.00,T,1.0,'
    dup2 = 'DEBIT,01/01/2024,"same desc",c,-20.00,T,1.0,'
    write_csv(str(data_dir), "chase1234.csv", [HEADER, dup1, dup2])
    cfg = EngineConfig(
        unprocessed_dir=str(data_dir),
        processed_dir=str(tmp_path / "done"),
        lake_dir=str(lake_dir),
    )
    ingest(spark, cfg)
    rows = read_transactions(spark, cfg.transactions_path).collect()
    assert len(rows) == 1
    assert rows[0]["amount"] == -10.00  # desc ordering: -10 > -20
