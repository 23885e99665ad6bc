"""Deterministic TPC-DS star-schema fixture generator (sf ~0.01), v3.

The inventory's 99 ``tpcds_q*_shape`` analogues exercise each query's
operator signature over the driver's TPC-H-ish fixtures, but they cannot
cover what the real schema exercises: calendar date_dim joins, decimal(7,2)
money columns, and null fact-table foreign keys. This generator writes a
minimal real-schema star — store_sales + 9 dimensions — so a third of
the reference's verbatim TPC-DS queries
(reference: benchmarks/queries-tpcds/q3.sql etc., run in CI by
.github/workflows/tpcds.yml:55-74) can run unmodified-in-structure against
the real table names/columns (inventory/tpcds_real*.py).

v3 (version-stamped in FIXTURES.md): widened for the second verbatim
tranche (q6/q8/q27/q28/q34/q36/q41/q43/q44/q46/q47/q48/q53/q59/q61/q63/
q65/q67/q68/q70/q73/q79/q89):
- store_sales gains BASKET semantics: a ticket spans 1..20 rows sharing
  customer/store/date/demographic FKs (real TPC-DS tickets are baskets —
  the q34/q46/q68/q73/q79 ticket-rollup queries are degenerate without
  them), plus ss_wholesale_cost / ss_ext_list_price / ss_ext_tax;
- item gains product attributes (name/color/units/size — q41's literal
  domains), real-style class-per-category and brand-name pools covering
  the q53/q63/q89 literals, i_wholesale_cost, and a second manufact band
  (742..782, q41's range) alongside 301..550 (q3's 436);
- store grows to 60 rows (q44 filters ss_store_sk = 50) and gains
  state/county/city/company/gmt_offset/employee columns;
- customer_address draws zips from a 200-zip pool whose head is q8's
  literal list (so its zip-neighborhood INTERSECT is non-empty) and gains
  city/gmt_offset; customer gains salutation/preferred flag; promotion
  gains dmail/tv channels; date_dim gains d_month_seq (TPC-DS month-seq
  epoch: (year-1900)*12 + month-1, so q53/q59/q63's 1185/1212 windows
  land inside the 1998-2002 calendar).

Determinism contract (same as the repo's hash-deterministic discipline —
no RNG anywhere): every field derives from the row index through
splitmix64, so regeneration is bit-identical on any platform/version.
Fixtures land in fixtures/tpcds_star/ and are committed; regeneration is
only needed if the schema here changes (version-stamp FIXTURES.md then):
``python tools/gen_tpcds_star.py --force``.

Scale shape mirrors real TPC-DS: one fact table (~120k rows at this sf,
6 orders of magnitude below a 100 TB deployment but schema-identical),
bounded dims (date_dim is 1826 rows for 5 years — constant in sf; item/
customer/store grow sublinearly). Plans proven here (fact-side shuffle,
broadcast dims, pushed date filters) are the plans that hold at SF1000.
"""

from __future__ import annotations

import datetime as dt
import os
from decimal import Decimal

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "fixtures", "tpcds_star")

N_SS = 120_000
N_ITEM = 2_000
N_CUSTOMER = 5_000
N_ADDRESS = 2_500
N_STORE = 60  # q44 filters ss_store_sk = 50 — must exist
N_PROMO = 30
DATE_START = dt.date(1998, 1, 1)
DATE_END = dt.date(2002, 12, 31)
DATE_SK_BASE = 2_450_815  # julian-style offset, TPC-DS convention

_U = np.uint64


def mix(i: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 of (i + salt*golden) — uniform uint64 per (row, field)."""
    x = i.astype(np.uint64) + _U((salt * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    x = (x ^ (x >> _U(30))) * _U(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U(27))) * _U(0x94D049BB133111EB)
    return x ^ (x >> _U(31))


def m(i: np.ndarray, salt: int, mod: int) -> np.ndarray:
    return (mix(i, salt) % _U(mod)).astype(np.int64)


def dec2(cents: np.ndarray, null_mask: np.ndarray | None = None) -> pa.Array:
    vals = [
        None
        if (null_mask is not None and null_mask[k])
        else Decimal(int(c)).scaleb(-2)
        for k, c in enumerate(cents)
    ]
    return pa.array(vals, type=pa.decimal128(7, 2))


def gen_date_dim() -> pa.Table:
    days = (DATE_END - DATE_START).days + 1
    dates = [DATE_START + dt.timedelta(days=int(k)) for k in range(days)]
    names = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday"]
    dow = [(d.isoweekday()) % 7 for d in dates]  # 0=Sunday, TPC-DS style
    return pa.table(
        {
            "d_date_sk": pa.array([DATE_SK_BASE + k for k in range(days)], pa.int64()),
            "d_date_id": pa.array([f"D{DATE_SK_BASE + k:09d}" for k in range(days)]),
            "d_date": pa.array(dates, pa.date32()),
            "d_year": pa.array([d.year for d in dates], pa.int32()),
            "d_moy": pa.array([d.month for d in dates], pa.int32()),
            "d_dom": pa.array([d.day for d in dates], pa.int32()),
            "d_qoy": pa.array([(d.month - 1) // 3 + 1 for d in dates], pa.int32()),
            "d_dow": pa.array(dow, pa.int32()),
            "d_day_name": pa.array([names[w] for w in dow]),
            "d_week_seq": pa.array([5270 + k // 7 for k in range(days)], pa.int32()),
            # TPC-DS month-seq epoch: 1212 <-> 2001-01 (q53/q63/q65/q67/q70),
            # 1185..1196 <-> 1998-10..1999-09 (q59's year-over-year windows).
            "d_month_seq": pa.array(
                [(d.year - 1900) * 12 + (d.month - 1) for d in dates], pa.int32()
            ),
        }
    )


_CATEGORIES = [
    "Books", "Children", "Electronics", "Home", "Jewelry",
    "Men", "Music", "Shoes", "Sports", "Women",
]

# Four classes per category; the q53/q63 ('personal','portable','reference',
# 'self-help' x Books/Children/Electronics; 'accessories','classical',
# 'fragrances','pants' x Women/Music/Men) and q89 ('wallpaper','parenting',
# 'musical'; 'womens','birdal','pants') literal intersections are non-empty.
_CLASSES = {
    "Books": ["personal", "reference", "self-help", "parenting"],
    "Children": ["portable", "personal", "toddlers", "infants"],
    "Electronics": ["portable", "musical", "reference", "cameras"],
    "Home": ["wallpaper", "kitchen", "bedding", "flatware"],
    "Jewelry": ["birdal", "diamonds", "gold", "pendants"],
    "Men": ["pants", "accessories", "shirts", "sports-apparel"],
    "Music": ["classical", "pop", "rock", "country"],
    "Shoes": ["womens", "mens", "kids", "athletic"],
    "Sports": ["fitness", "camping", "hockey", "golf"],
    "Women": ["fragrances", "accessories", "dresses", "maternity"],
}

# Brand-name pool in the real dsdgen style; head = the 8 literals q53/q63
# filter on.
_BRANDS = [
    "scholaramalgamalg #14", "scholaramalgamalg #7", "exportiunivamalg #9",
    "scholaramalgamalg #9", "amalgimporto #1", "edu packscholar #1",
    "exportiimporto #1", "importoamalg #1", "amalgamalg #2",
    "importonameless #3", "edu packedu pack #4", "corpunivamalg #5",
    "brandbrand #6", "scholarbrand #8", "univmaxi #10", "namelesscorp #11",
]

# q41's literal color/unit/size domains (plus a few extras for colors).
_COLORS = [
    "orchid", "papaya", "burlywood", "navy", "bisque", "azure", "chocolate",
    "cornflower", "salmon", "midnight", "snow", "steel", "purple",
    "gainsboro", "metallic", "forest", "khaki", "ivory", "maroon", "teal",
]
_UNITS = [
    "Pound", "Lb", "Bundle", "Each", "N/A", "Tsp", "Bunch", "Gross",
    "Oz", "Box", "Carton", "Tbl", "Dram", "Unknown", "Gram", "Ounce",
]
_SIZES = ["petite", "medium", "N/A", "extra large", "small", "large"]


def gen_item() -> pa.Table:
    i = np.arange(1, N_ITEM + 1, dtype=np.uint64)
    # Two manufact bands: 301..550 (dense — q3's literal 436 must be
    # non-empty) plus a 10% "hot" slice at 742..782 (q41's BETWEEN range).
    # Hot items skew Men/Women with literal-head colors so q41's
    # correlated color/units/size count finds matches inside the band.
    hot = m(i, 85, 10) == 0
    manufact_id = np.where(hot, m(i, 86, 41) + 742, m(i, 5, 250) + 301)
    cat_id = np.where(hot, np.where(m(i, 87, 2) == 0, 6, 10), m(i, 2, 10) + 1)
    class_k = m(i, 3, 4)
    brand_k = m(i, 4, len(_BRANDS))
    brand_id = cat_id * 1000 + brand_k + 1
    manager_id = m(i, 6, 100) + 1
    price_c = m(i, 7, 9_900) + 99
    wholesale_c = m(i, 8, 12_000) + 100
    cats = [_CATEGORIES[int(c) - 1] for c in cat_id]
    color_k = np.where(hot, m(i, 9, 16), m(i, 9, len(_COLORS)))
    colors = [_COLORS[int(k)] for k in color_k]
    units = [_UNITS[int(k)] for k in m(i, 10, len(_UNITS))]
    sizes = [_SIZES[int(k)] for k in m(i, 11, len(_SIZES))]
    return pa.table(
        {
            "i_item_sk": pa.array(i.astype(np.int64)),
            "i_item_id": pa.array([f"ITEM{k:012d}" for k in i]),
            "i_item_desc": pa.array(
                [f"{c} item number {int(k)} described at length" for k, c in zip(i, cats)]
            ),
            "i_current_price": dec2(price_c),
            "i_wholesale_cost": dec2(wholesale_c),
            "i_brand_id": pa.array(brand_id, pa.int32()),
            "i_brand": pa.array([_BRANDS[int(b)] for b in brand_k]),
            "i_class_id": pa.array((cat_id * 10 + class_k + 1), pa.int32()),
            "i_class": pa.array(
                [_CLASSES[c][int(k)] for c, k in zip(cats, class_k)]
            ),
            "i_category_id": pa.array(cat_id, pa.int32()),
            "i_category": pa.array(cats),
            "i_manufact_id": pa.array(manufact_id, pa.int32()),
            "i_manufact": pa.array([f"manufact#{int(x)}" for x in manufact_id]),
            "i_manager_id": pa.array(manager_id, pa.int32()),
            "i_product_name": pa.array(
                [f"{c}{s.replace(' ', '')}product{int(k):05d}"
                 for k, c, s in zip(i, colors, sizes)]
            ),
            "i_color": pa.array(colors),
            "i_units": pa.array(units),
            "i_size": pa.array(sizes),
        }
    )


_SALUTATIONS = ["Mr.", "Mrs.", "Ms.", "Dr.", "Sir", "Miss"]


def gen_customer() -> pa.Table:
    i = np.arange(1, N_CUSTOMER + 1, dtype=np.uint64)
    return pa.table(
        {
            "c_customer_sk": pa.array(i.astype(np.int64)),
            "c_customer_id": pa.array([f"CUST{k:012d}" for k in i]),
            "c_current_addr_sk": pa.array(m(i, 20, N_ADDRESS) + 1),
            "c_first_name": pa.array([f"First{int(m(np.array([k]), 21, 500)[0])}" for k in i]),
            "c_last_name": pa.array([f"Last{int(m(np.array([k]), 22, 700)[0])}" for k in i]),
            "c_salutation": pa.array(
                [_SALUTATIONS[int(v)] for v in m(i, 23, len(_SALUTATIONS))]
            ),
            # ~55% preferred: q8's HAVING count(*) > 10 per zip needs real
            # per-zip preferred-customer mass (5000 customers / 200 zips).
            "c_preferred_cust_flag": pa.array(
                ["Y" if v < 11 else "N" for v in m(i, 24, 20)]
            ),
        }
    )


_STATES = [
    "CO", "IL", "MN", "OH", "MT", "NM", "TX", "MO", "MI",  # q13's literals
    "CA", "NY", "FL", "WA", "OR", "GA", "PA", "NC", "VA", "AZ", "TN",
]

# 200-zip pool; head = q8's literal IN-list prefix so its zip-neighborhood
# INTERSECT subquery is non-empty. ~12 addresses per zip at N_ADDRESS=2500.
_ZIP_POOL = [
    "89436", "30868", "65085", "22977", "83927", "77557", "58429", "40697",
    "80614", "10502", "32779", "91137", "61265", "98294", "17921", "18427",
    "21203", "59362", "87291", "84093", "21505", "17184", "10866", "67898",
    "25797", "28055", "18377", "80332", "74535", "21757", "29742", "90885",
    "29898", "17819", "40811", "25990", "47513", "89531", "91068", "10391",
] + [f"{(10007 * (k + 3)) % 90000 + 10000:05d}" for k in range(160)]

_CITIES = [
    "Oakland", "Riverside", "Union", "Salem", "Greenwood",  # q46's literals
    "Midway", "Fairview", "Springdale", "Centerville", "Mount Zion",
    "Liberty", "Pleasant Hill", "Lakeview", "Glendale", "Marion",
    "Walnut Grove", "Oak Grove", "Georgetown", "Ashland", "Newport",
]

_GMT_OFFSETS = [-5, -6, -7, -8]  # q43 filters -6, q61 filters -7


def gen_customer_address() -> pa.Table:
    i = np.arange(1, N_ADDRESS + 1, dtype=np.uint64)
    return pa.table(
        {
            "ca_address_sk": pa.array(i.astype(np.int64)),
            "ca_address_id": pa.array([f"ADDR{k:012d}" for k in i]),
            "ca_city": pa.array([_CITIES[int(v)] for v in m(i, 24, len(_CITIES))]),
            "ca_zip": pa.array([_ZIP_POOL[int(z)] for z in m(i, 25, len(_ZIP_POOL))]),
            "ca_state": pa.array([_STATES[int(s)] for s in m(i, 26, len(_STATES))]),
            # ~95% US, the TPC-DS q13/q48 country predicate target
            "ca_country": pa.array(
                ["United States" if v else "Canada" for v in m(i, 27, 20) > 0]
            ),
            "ca_gmt_offset": pa.array(
                [_GMT_OFFSETS[int(v)] for v in m(i, 28, len(_GMT_OFFSETS))],
                pa.int32(),
            ),
        }
    )


# TPC-DS's own cycling store names (q88/q96 filter on 'ese' verbatim).
_STORE_NAMES = ["able", "ation", "bar", "ese", "eing", "ought"]
_STORE_STATES = ["MO", "LA", "GA", "MI", "SC", "OH", "SD", "AL", "TX", "CA", "IL", "MN"]
_COUNTIES = [
    "Daviess County", "Franklin Parish", "Barrow County", "Luce County",
    "Fairfield County", "Richland County", "Ziebach County", "Walker County",
    "Huron County", "Pennington County",
]
_COMPANIES = ["Unknown", "ought", "able corp"]


def gen_store() -> pa.Table:
    i = np.arange(1, N_STORE + 1, dtype=np.uint64)
    return pa.table(
        {
            "s_store_sk": pa.array(i.astype(np.int64)),
            "s_store_id": pa.array([f"STORE{k:08d}" for k in i]),
            "s_store_name": pa.array(
                [_STORE_NAMES[int(k - 1) % len(_STORE_NAMES)] for k in i]
            ),
            "s_company_name": pa.array(
                [_COMPANIES[int(v)] for v in m(i, 29, len(_COMPANIES))]
            ),
            "s_state": pa.array(
                [_STORE_STATES[int(v)] for v in m(i, 31, len(_STORE_STATES))]
            ),
            "s_county": pa.array([_COUNTIES[int(v)] for v in m(i, 32, len(_COUNTIES))]),
            "s_city": pa.array([_CITIES[int(v)] for v in m(i, 33, 8)]),
            "s_zip": pa.array([_ZIP_POOL[int(z)] for z in m(i, 30, len(_ZIP_POOL))]),
            "s_gmt_offset": pa.array(
                [_GMT_OFFSETS[int(v)] for v in m(i, 34, len(_GMT_OFFSETS))],
                pa.int32(),
            ),
            # q79's BETWEEN 200 AND 295 lands mid-domain
            "s_number_employees": pa.array(m(i, 35, 200) + 150, pa.int32()),
        }
    )


_GENDERS = ["M", "F"]
_MARITAL = ["D", "M", "S", "U", "W"]
_EDUCATION = [
    "Primary", "Secondary", "College", "2 yr Degree",
    "4 yr Degree", "Advanced Degree", "Unknown",
]


def gen_customer_demographics() -> pa.Table:
    # Full cross product x 4 purchase bands — 280 rows, every predicate
    # combination reachable (real cd is the same idea at 1.92M rows).
    rows = []
    sk = 1
    for band in range(4):
        for g in _GENDERS:
            for ms in _MARITAL:
                for ed in _EDUCATION:
                    rows.append((sk, g, ms, ed, (band + 1) * 2500))
                    sk += 1
    t = list(zip(*rows))
    return pa.table(
        {
            "cd_demo_sk": pa.array(t[0], pa.int64()),
            "cd_gender": pa.array(t[1]),
            "cd_marital_status": pa.array(t[2]),
            "cd_education_status": pa.array(t[3]),
            "cd_purchase_estimate": pa.array(t[4], pa.int32()),
        }
    )


N_HDEMO = 600
_BUY_POTENTIAL = ["0-500", "501-1000", "1001-5000", "5001-10000", ">10000", "Unknown"]


def gen_household_demographics() -> pa.Table:
    i = np.arange(1, N_HDEMO + 1, dtype=np.uint64)
    return pa.table(
        {
            "hd_demo_sk": pa.array(i.astype(np.int64)),
            "hd_income_band_sk": pa.array(m(i, 44, 20) + 1),
            "hd_buy_potential": pa.array(
                [_BUY_POTENTIAL[int(v)] for v in m(i, 45, len(_BUY_POTENTIAL))]
            ),
            "hd_dep_count": pa.array(m(i, 46, 10), pa.int32()),
            "hd_vehicle_count": pa.array(m(i, 47, 6), pa.int32()),
        }
    )


def gen_time_dim() -> pa.Table:
    # One row per second of day, the real table's full 86400 — q88/q96's
    # hour/minute band predicates need genuine time-dim semantics.
    sk = np.arange(86_400, dtype=np.int64)
    return pa.table(
        {
            "t_time_sk": pa.array(sk),
            "t_time": pa.array(sk, pa.int32()),
            "t_hour": pa.array(sk // 3600, pa.int32()),
            "t_minute": pa.array((sk % 3600) // 60, pa.int32()),
            "t_second": pa.array(sk % 60, pa.int32()),
            "t_am_pm": pa.array(["AM" if s < 43_200 else "PM" for s in sk]),
        }
    )


def gen_promotion() -> pa.Table:
    i = np.arange(1, N_PROMO + 1, dtype=np.uint64)
    return pa.table(
        {
            "p_promo_sk": pa.array(i.astype(np.int64)),
            "p_promo_id": pa.array([f"PROMO{k:08d}" for k in i]),
            "p_channel_email": pa.array(["N" if v else "Y" for v in m(i, 40, 2)]),
            "p_channel_event": pa.array(["N" if v == 0 else "Y" for v in m(i, 41, 3)]),
            "p_channel_dmail": pa.array(["Y" if v == 0 else "N" for v in m(i, 42, 3)]),
            "p_channel_tv": pa.array(["Y" if v == 0 else "N" for v in m(i, 43, 3)]),
        }
    )


def gen_store_sales() -> pa.Table:
    """Basket-structured fact: tickets of 1..20 rows share the per-visit
    FKs (date/time/store/customer/demographics/address); item and money
    columns vary per row. The ticket-rollup verbatim queries (q34 cnt
    15..20, q73 cnt 1..5, q46/q68/q79 per-ticket sums) depend on this."""
    n_days = (DATE_END - DATE_START).days + 1
    sizes = m(np.arange(N_SS, dtype=np.uint64), 80, 20) + 1
    ends = np.cumsum(sizes)
    n_t = int(np.searchsorted(ends, N_SS)) + 1
    sizes = sizes[:n_t].copy()
    sizes[-1] -= int(ends[n_t - 1] - N_SS)
    t = np.repeat(np.arange(n_t, dtype=np.uint64), sizes)  # row -> ticket
    i = np.arange(N_SS, dtype=np.uint64)

    qty = m(i, 60, 100) + 1
    list_c = m(i, 61, 19_900) + 100  # 1.00 .. 200.00
    pct = m(i, 62, 50) + 50  # sales price = 50..99% of list
    sales_c = list_c * pct // 100
    ext_c = sales_c * qty
    ext_list_c = list_c * qty
    ext_tax_c = ext_c * m(i, 72, 9) // 100  # 0..8% tax on the extended price
    coupon_c = np.where(m(i, 63, 10) == 0, m(i, 64, 2_000), 0)
    # Real-schema pattern: fact FKs are nullable (~4%, per-ticket for the
    # visit-level keys) — joins must drop, never match, these rows.
    null_cust = m(t, 65, 25) == 0
    null_cdemo = m(t, 66, 25) == 0
    null_promo = m(i, 67, 25) == 0
    null_hdemo = m(t, 68, 25) == 0
    null_addr = m(t, 69, 25) == 0
    cd_total = 4 * len(_GENDERS) * len(_MARITAL) * len(_EDUCATION)
    wholesale_c = m(i, 70, 15_000) + 50  # 0.50 .. 150.49
    # profit spans negative (loss) through positive, q13's 50..300 band hit
    profit_c = m(i, 71, 40_000) - 10_000  # -100.00 .. 299.99

    def fk(vals: np.ndarray, mask: np.ndarray) -> pa.Array:
        return pa.array(
            [None if mask[k] else int(v) for k, v in enumerate(vals)], pa.int64()
        )

    return pa.table(
        {
            "ss_sold_date_sk": pa.array(DATE_SK_BASE + m(t, 50, n_days)),
            "ss_sold_time_sk": pa.array(m(t, 56, 86_400)),
            "ss_item_sk": pa.array(m(i, 51, N_ITEM) + 1),
            "ss_customer_sk": fk(m(t, 52, N_CUSTOMER) + 1, null_cust),
            "ss_cdemo_sk": fk(m(t, 53, cd_total) + 1, null_cdemo),
            "ss_hdemo_sk": fk(m(t, 57, N_HDEMO) + 1, null_hdemo),
            "ss_addr_sk": fk(m(t, 58, N_ADDRESS) + 1, null_addr),
            "ss_store_sk": pa.array(m(t, 54, N_STORE) + 1),
            "ss_promo_sk": fk(m(i, 55, N_PROMO) + 1, null_promo),
            "ss_ticket_number": pa.array(t.astype(np.int64) + 1),
            "ss_quantity": pa.array(qty, pa.int32()),
            "ss_wholesale_cost": dec2(wholesale_c),
            "ss_list_price": dec2(list_c),
            "ss_sales_price": dec2(sales_c),
            "ss_ext_sales_price": dec2(ext_c.astype(np.int64)),
            "ss_ext_list_price": dec2(ext_list_c.astype(np.int64)),
            "ss_ext_tax": dec2(ext_tax_c.astype(np.int64)),
            "ss_ext_wholesale_cost": dec2(wholesale_c),
            "ss_coupon_amt": dec2(coupon_c),
            "ss_net_profit": dec2(profit_c),
        }
    )


GENERATORS = {
    "date_dim": gen_date_dim,
    "item": gen_item,
    "customer": gen_customer,
    "customer_address": gen_customer_address,
    "store": gen_store,
    "customer_demographics": gen_customer_demographics,
    "household_demographics": gen_household_demographics,
    "time_dim": gen_time_dim,
    "promotion": gen_promotion,
    "store_sales": gen_store_sales,
}


def ensure_fixture(out_dir: str = OUT_DIR) -> str:
    """Generate any missing table; returns the fixture dir (idempotent —
    committed fixtures are never rewritten, so bytes stay stable)."""
    out_dir = os.path.abspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    for name, gen in GENERATORS.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(path):
            pq.write_table(gen(), path, compression="zstd")
    return out_dir


if __name__ == "__main__":
    import sys

    if "--force" in sys.argv:
        for name in GENERATORS:
            p = os.path.join(os.path.abspath(OUT_DIR), f"{name}.parquet")
            if os.path.exists(p):
                os.remove(p)
    d = ensure_fixture()
    for name in GENERATORS:
        t = pq.read_table(os.path.join(d, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows, {t.num_columns} cols")
