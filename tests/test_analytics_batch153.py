"""Batch 153: max rally, next-greater day census."""
import pyarrow as pa
import pyarrow.parquet as pq


def _orders(tmp_path, days, prices):
    pq.write_table(pa.table({
        "o_orderdate": pa.array(days, pa.date32()),
        "o_totalprice": pa.array(prices, pa.float64()),
    }), str(tmp_path / "orders.parquet"))


def test_daily_revenue_max_rally(ray_session, tmp_path):
    import datetime as dt
    from ctdray.pipelines.analytics import daily_revenue_max_rally
    d = [dt.date(2024, 1, i) for i in (1, 2, 3, 4)]
    # levels: 500, 200, 900, 300 cents -> running mins 500,200,200,200
    # rallies 0,0,700,100 -> max 700 on day 3
    _orders(tmp_path, d, [5.0, 2.0, 9.0, 3.0])
    out = daily_revenue_max_rally(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (4, 200, 700, "2024-01-03")]


def test_rally_zero_on_decreasing(ray_session, tmp_path):
    import datetime as dt
    from ctdray.pipelines.analytics import daily_revenue_max_rally
    d = [dt.date(2024, 1, i) for i in (1, 2)]
    _orders(tmp_path, d, [9.0, 2.0])
    out = daily_revenue_max_rally(str(tmp_path)).to_pandas()
    # max rally 0, first attained on the first day (matches the SQL
    # min(day) WHERE v - rmin = 0)
    assert list(map(tuple, out.values)) == [(2, 200, 0, "2024-01-01")]


def test_order_day_next_greater_census(ray_session, tmp_path):
    import datetime as dt
    from ctdray.pipelines.analytics import \
        order_day_next_greater_census
    # per-day order counts: 2, 1, 3, 3 (multiplicity = count)
    days = ([dt.date(2024, 1, 1)] * 2 + [dt.date(2024, 1, 2)]
            + [dt.date(2024, 1, 3)] * 3 + [dt.date(2024, 1, 4)] * 3)
    _orders(tmp_path, days, [1.0] * len(days))
    out = order_day_next_greater_census(str(tmp_path)).to_pandas()
    # next-greater distances: day1 -> day3 (2), day2 -> day3 (1),
    # day3 -> none (-1), day4 -> none (-1)
    assert list(map(tuple, out.values)) == [(-1, 2), (1, 1), (2, 1)]
