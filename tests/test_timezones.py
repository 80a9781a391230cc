"""Time-zone-aware Datetime semantics (reference: polars-time DST
handling). Epochs are stored UTC; components use local wall time via
per-zone transition tables (`ops/tzdata.py`)."""

from datetime import date, datetime, timedelta, timezone

import pytest
from zoneinfo import ZoneInfo

import polaroid_tpu as pl


def aware(y, mo, d, h=0, m=0, tz="Europe/Zurich"):
    return datetime(y, mo, d, h, m, tzinfo=ZoneInfo(tz))


def test_convert_time_zone_components():
    s = pl.Series("t", [datetime(2024, 1, 1, 12), datetime(2024, 7, 1, 12)])
    z = s.dt.replace_time_zone("UTC").dt.convert_time_zone("Europe/Zurich")
    assert z.dt.hour().to_list() == [13, 14]  # CET +1 / CEST +2
    assert z.dt.day().to_list() == [1, 1]


def test_replace_time_zone_preserves_wall_time():
    s = pl.Series("t", [datetime(2024, 1, 1, 12)])
    utc = s.dt.replace_time_zone("UTC")
    zrh = s.dt.replace_time_zone("Europe/Zurich")
    assert zrh.dt.hour().to_list() == [12]
    assert zrh.dt.epoch("s").to_list()[0] == \
        utc.dt.epoch("s").to_list()[0] - 3600
    naive = zrh.dt.convert_time_zone("UTC").dt.replace_time_zone(None)
    assert naive.dt.hour().to_list() == [11]


def test_dst_transition():
    # Europe/Zurich springs forward 2024-03-31 02:00 CET -> 03:00 CEST
    b = pl.Series("t", [datetime(2024, 3, 31, 0, 59),
                        datetime(2024, 3, 31, 1, 1)])
    loc = b.dt.replace_time_zone("UTC").dt.convert_time_zone("Europe/Zurich")
    assert loc.dt.hour().to_list() == [1, 3]
    assert loc.dt.dst_offset().to_list() == [timedelta(0),
                                             timedelta(hours=1)]
    assert loc.dt.base_utc_offset().to_list() == [timedelta(hours=1)] * 2


def test_local_date_across_midnight():
    ny = pl.Series("t", [datetime(2024, 1, 1, 3)]) \
        .dt.replace_time_zone("UTC").dt.convert_time_zone("America/New_York")
    assert ny.dt.date().to_list() == [date(2023, 12, 31)]
    assert ny.dt.weekday().to_list() == [7]  # Sunday local


def test_truncate_in_local_time():
    z = pl.Series("t", [datetime(2024, 7, 1, 1, 30)]) \
        .dt.replace_time_zone("UTC").dt.convert_time_zone("Europe/Zurich")
    tr = z.dt.truncate("1d")  # local midnight
    assert tr.dt.hour().to_list() == [0]
    assert tr.dt.convert_time_zone("UTC").dt.hour().to_list() == [22]


def test_aware_construction_and_decode():
    z = ZoneInfo("Europe/Zurich")
    s = pl.Series("t", [aware(2024, 1, 1, 13)])
    assert repr(s.dtype) == "Datetime(us, Europe/Zurich)"
    out = s.to_list()
    assert out == [aware(2024, 1, 1, 13)]
    assert out[0].tzinfo is not None
    u = pl.Series("t", [datetime(2024, 1, 1, tzinfo=timezone.utc)])
    assert repr(u.dtype) == "Datetime(us, UTC)"


def test_tz_parquet_roundtrip(tmp_path):
    s = pl.Series("t", [aware(2024, 1, 1, 13), aware(2024, 7, 1, 9)])
    df = s.to_frame()
    p = str(tmp_path / "tz.parquet")
    df.write_parquet(p)
    back = pl.read_parquet(p)
    assert repr(back.schema["t"]) == "Datetime(us, Europe/Zurich)"
    assert back.to_dict()["t"] == s.to_list()


def test_fixed_offset_zone():
    s = pl.Series("t", [datetime(2024, 1, 1, 12)]) \
        .dt.replace_time_zone("UTC").dt.convert_time_zone("+05:30")
    assert s.dt.hour().to_list() == [17]
    assert s.dt.minute().to_list() == [30]


def test_convert_on_naive_raises():
    s = pl.Series("t", [datetime(2024, 1, 1)])
    with pytest.raises(pl.exceptions.InvalidOperationError):
        s.dt.convert_time_zone("Europe/Zurich")


def test_epoch_units():
    s = pl.Series("t", [datetime(1970, 1, 3, 6)])
    assert s.dt.epoch("d").to_list() == [2]
    assert s.dt.epoch("s").to_list() == [2 * 86400 + 6 * 3600]


def test_date_plus_duration():
    df = pl.DataFrame({"d": [date(2024, 1, 1), date(2024, 1, 5)]})
    out = df.with_columns((pl.col("d") + pl.duration(days=2)).alias("e"))
    assert out.to_dict()["e"] == [date(2024, 1, 3), date(2024, 1, 7)]
    out2 = df.select((pl.col("d") - pl.duration(weeks=1)).alias("e"))
    assert out2.to_dict()["e"] == [date(2023, 12, 25), date(2023, 12, 29)]
