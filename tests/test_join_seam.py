"""The size-seamed auto join (`relational._join_auto`) must produce
the same row set on both physical paths: the broadcast map-side merge
(default at fixture scale) and the hash-shuffle `Dataset.join`
(forced via CCRAWLER_BCAST_JOIN_ROWS=0 — the 100 TB path)."""

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

SEAMED = [
    "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume",
    "q7_volume_shipping", "q8_market_share", "q10_returned_revenue",
    "q12_late_priority", "q13_customer_distribution", "q18_big_orders",
    "q22_sales_opportunity",
]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", SEAMED)
def test_join_seam_paths_agree(name, monkeypatch):
    import __ray_entry__ as E
    from tests.test_queries_oracle import _norm, _to_pandas

    q = E.queries()[name]
    bcast = _to_pandas(q(SF_DIR))
    monkeypatch.setenv("CCRAWLER_BCAST_JOIN_ROWS", "0")
    shuffled = _to_pandas(q(SF_DIR))
    pd.testing.assert_frame_equal(_norm(bcast), _norm(shuffled),
                                  check_dtype=False)
