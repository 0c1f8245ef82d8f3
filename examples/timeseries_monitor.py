"""Time-series monitoring tour: OHLC bars (batch + the same aggregate as a
stream), gap repair, change-points, drawdown, and seasonal anomaly days —
the round-5 time-series operators driven through the public registry.

Run: python examples/timeseries_monitor.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from mdio_cpp_spark.plans import REGISTRY
from mdio_cpp_spark.session import get_spark

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("timeseries-example", master="local[4]")

    print("== daily OHLC bars per event type (min_by/max_by, no window)")
    REGISTRY["ts03_ohlc_downsample"].spark(spark, SF).show(8)

    print("== linear interpolation across simulated outage gaps")
    REGISTRY["ts04_gap_interpolate"].spark(spark, SF).filter("src = 'interp'").show(8)

    print("== does click volume lead purchases? Pearson r at lag 0..6 days")
    REGISTRY["ts05_crosscorr_lags"].spark(spark, SF).show()

    print("== CUSUM change-point day per event type")
    REGISTRY["ts06_cusum_changepoint"].spark(spark, SF).show()

    print("== max drawdown of cumulative revenue")
    REGISTRY["w16_max_drawdown"].spark(spark, SF).show()

    print("== leave-one-out weekday-seasonal anomaly days (|z| > 3)")
    REGISTRY["ev15_seasonal_anomaly"].spark(spark, SF).show(8)

    print("== EWMA-smoothed daily revenue (exact shift-weight decay)")
    REGISTRY["w18_ewma"].spark(spark, SF).show(8)

    print("== Kaplan-Meier churn survival (right-censored purchase lifespans)")
    REGISTRY["ev19_survival_km"].spark(spark, SF).show(8)

    print("== hourly OHLC, the streaming-capable formulation (batch twin)")
    REGISTRY["st09_stream_ohlc"].spark(spark, SF).show(8)
    print("   (streaming parity: tests/test_streaming.py::test_ohlc_parity)")

    spark.stop()


if __name__ == "__main__":
    main()
