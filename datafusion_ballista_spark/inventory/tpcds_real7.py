"""Verbatim TPC-DS queries over the real star schema, tranche 7 (q4-q66).

Reference: benchmarks/queries-tpcds/q{4,32,51,54,56,57,58,60,62,64,66}.sql
(CI suite .github/workflows/tpcds.yml:55-74), over star fixture v4.
Same fidelity contract / deviation classes as the earlier tranches, plus:
q32/q62's single-quoted aliases renamed; q54's ``cast(revenue/50 as int)``
becomes ``cast(floor(revenue/50) as int)`` (Spark truncates decimal->int,
DuckDB rounds — floor is the common semantics for the non-negative
revenue); q66's ``year`` alias renamed ``yr`` (DuckDB reserves it in some
positions); INTERVAL endpoints precomputed.
"""

from __future__ import annotations

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.tpcds_real import _oracle, _spark_runner

# -- q4 (q4.sql verbatim: three-channel year-over-year growth panel) ---------
_Q4_CHANNEL = """
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum(((({p}_ext_list_price-{p}_ext_wholesale_cost-{p}_ext_discount_amt)+{p}_ext_sales_price)/2) ) year_total
       ,'{t}' sale_type
 from customer
     ,{fact}
     ,date_dim
 where c_customer_sk = {cust}
   and {p}_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
"""

Q4_BODY = (
    "with year_total as ("
    + _Q4_CHANNEL.format(p="ss", t="s", fact="store_sales", cust="ss_customer_sk")
    + " union all"
    + _Q4_CHANNEL.format(p="cs", t="c", fact="catalog_sales", cust="cs_bill_customer_sk")
    + " union all"
    + _Q4_CHANNEL.format(p="ws", t="w", fact="web_sales", cust="ws_bill_customer_sk")
    + """
         )
  select
                  t_s_secyear.customer_id
                 ,t_s_secyear.customer_first_name
                 ,t_s_secyear.customer_last_name
                 ,t_s_secyear.customer_email_address
 from year_total t_s_firstyear
     ,year_total t_s_secyear
     ,year_total t_c_firstyear
     ,year_total t_c_secyear
     ,year_total t_w_firstyear
     ,year_total t_w_secyear
 where t_s_secyear.customer_id = t_s_firstyear.customer_id
   and t_s_firstyear.customer_id = t_c_secyear.customer_id
   and t_s_firstyear.customer_id = t_c_firstyear.customer_id
   and t_s_firstyear.customer_id = t_w_firstyear.customer_id
   and t_s_firstyear.customer_id = t_w_secyear.customer_id
   and t_s_firstyear.sale_type = 's'
   and t_c_firstyear.sale_type = 'c'
   and t_w_firstyear.sale_type = 'w'
   and t_s_secyear.sale_type = 's'
   and t_c_secyear.sale_type = 'c'
   and t_w_secyear.sale_type = 'w'
   and t_s_firstyear.dyear =  2001
   and t_s_secyear.dyear = 2001+1
   and t_c_firstyear.dyear =  2001
   and t_c_secyear.dyear =  2001+1
   and t_w_firstyear.dyear = 2001
   and t_w_secyear.dyear = 2001+1
   and t_s_firstyear.year_total > 0
   and t_c_firstyear.year_total > 0
   and t_w_firstyear.year_total > 0
   and case when t_c_firstyear.year_total > 0 then t_c_secyear.year_total / t_c_firstyear.year_total else null end
           > case when t_s_firstyear.year_total > 0 then t_s_secyear.year_total / t_s_firstyear.year_total else null end
   and case when t_c_firstyear.year_total > 0 then t_c_secyear.year_total / t_c_firstyear.year_total else null end
           > case when t_w_firstyear.year_total > 0 then t_w_secyear.year_total / t_w_firstyear.year_total else null end
 order by t_s_secyear.customer_id
         ,t_s_secyear.customer_first_name
         ,t_s_secyear.customer_last_name
         ,t_s_secyear.customer_email_address
limit 100
"""
)

# -- q32 (q32.sql: excess catalog discounts vs 1.3x item average; quoted
#    alias renamed, endpoint precomputed ('1998-06-16')) ---------------------
Q32_BODY = """
select  cast(sum(cs_ext_discount_amt) as double)  as excess_discount_amount
from
   catalog_sales
   ,item
   ,date_dim
where
i_manufact_id = 269
and i_item_sk = cs_item_sk
and d_date between cast('1998-03-18' as date) and
        cast('1998-06-16' as date)
and d_date_sk = cs_sold_date_sk
and cs_ext_discount_amt
     > (
         select
            1.3 * avg(cs_ext_discount_amt)
         from
            catalog_sales
           ,date_dim
         where
              cs_item_sk = i_item_sk
          and d_date between cast('1998-03-18' as date) and
                             cast('1998-06-16' as date)
          and d_date_sk = cs_sold_date_sk
      )
limit 100
"""

# -- q51 (q51.sql: cumulative web-vs-store sales crossover via full outer
#    join + running max; money outputs pinned to double) ---------------------
Q51_BODY = """
WITH web_v1 as (
select
  ws_item_sk item_sk, d_date,
  sum(sum(ws_sales_price))
      over (partition by ws_item_sk order by d_date rows between unbounded preceding and current row) cume_sales
from web_sales
    ,date_dim
where ws_sold_date_sk=d_date_sk
  and d_month_seq between 1212 and 1212+11
  and ws_item_sk is not NULL
group by ws_item_sk, d_date),
store_v1 as (
select
  ss_item_sk item_sk, d_date,
  sum(sum(ss_sales_price))
      over (partition by ss_item_sk order by d_date rows between unbounded preceding and current row) cume_sales
from store_sales
    ,date_dim
where ss_sold_date_sk=d_date_sk
  and d_month_seq between 1212 and 1212+11
  and ss_item_sk is not NULL
group by ss_item_sk, d_date)
 select  item_sk
     ,d_date
     ,cast(web_sales as double) web_sales
     ,cast(store_sales as double) store_sales
     ,cast(web_cumulative as double) web_cumulative
     ,cast(store_cumulative as double) store_cumulative
from (select item_sk
     ,d_date
     ,web_sales
     ,store_sales
     ,max(web_sales)
         over (partition by item_sk order by d_date rows between unbounded preceding and current row) web_cumulative
     ,max(store_sales)
         over (partition by item_sk order by d_date rows between unbounded preceding and current row) store_cumulative
     from (select case when web.item_sk is not null then web.item_sk else store.item_sk end item_sk
                 ,case when web.d_date is not null then web.d_date else store.d_date end d_date
                 ,web.cume_sales web_sales
                 ,store.cume_sales store_sales
           from web_v1 web full outer join store_v1 store on (web.item_sk = store.item_sk
                                                          and web.d_date = store.d_date)
          )x )y
where web_cumulative > store_cumulative
order by item_sk
        ,d_date
limit 100
"""

# -- q54 (q54.sql: revenue segments of cross-channel Jewelry buyers;
#    floor() pins the decimal->int cast — see module docstring) --------------
Q54_BODY = """
with my_customers as (
 select distinct c_customer_sk
        , c_current_addr_sk
 from
        ( select cs_sold_date_sk sold_date_sk,
                 cs_bill_customer_sk customer_sk,
                 cs_item_sk item_sk
          from   catalog_sales
          union all
          select ws_sold_date_sk sold_date_sk,
                 ws_bill_customer_sk customer_sk,
                 ws_item_sk item_sk
          from   web_sales
         ) cs_or_ws_sales,
         item,
         date_dim,
         customer
 where   sold_date_sk = d_date_sk
         and item_sk = i_item_sk
         and i_category = 'Jewelry'
         and i_class = 'consignment'
         and c_customer_sk = cs_or_ws_sales.customer_sk
         and d_moy = 3
         and d_year = 1999
 )
 , my_revenue as (
 select c_customer_sk,
        sum(ss_ext_sales_price) as revenue
 from   my_customers,
        store_sales,
        customer_address,
        store,
        date_dim
 where  c_current_addr_sk = ca_address_sk
        and ca_county = s_county
        and ca_state = s_state
        and ss_sold_date_sk = d_date_sk
        and c_customer_sk = ss_customer_sk
        and d_month_seq between (select distinct d_month_seq+1
                                 from   date_dim where d_year = 1999 and d_moy = 3)
                           and  (select distinct d_month_seq+3
                                 from   date_dim where d_year = 1999 and d_moy = 3)
 group by c_customer_sk
 )
 , segments as
 (select cast(floor(revenue/50) as int) as segment
  from   my_revenue
 )
  select  segment, count(*) as num_customers, segment*50 as segment_base
 from segments
 group by segment
 order by segment, num_customers
 limit 100
"""


def _q333_channel(pre: str, fact: str, addr: str, item_pred: str,
                  year: int, moy: int, gmt: int) -> str:
    return f"""
 select i_item_id,sum({pre}_ext_sales_price) total_sales
 from
 	{fact},
 	date_dim,
         customer_address,
         item
 where i_item_id in (select
     i_item_id
from item
where {item_pred})
 and     {pre}_item_sk              = i_item_sk
 and     {pre}_sold_date_sk         = d_date_sk
 and     d_year                  = {year}
 and     d_moy                   = {moy}
 and     {addr}              = ca_address_sk
 and     ca_gmt_offset           = {gmt}
 group by i_item_id"""


# -- q56 (q56.sql: color-item sales across all three channels) ---------------
Q56_BODY = (
    "with ss as ("
    + _q333_channel("ss", "store_sales", "ss_addr_sk",
                    "i_color in ('orchid','chiffon','lace')", 2000, 1, -8)
    + "),\n cs as ("
    + _q333_channel("cs", "catalog_sales", "cs_bill_addr_sk",
                    "i_color in ('orchid','chiffon','lace')", 2000, 1, -8)
    + "),\n ws as ("
    + _q333_channel("ws", "web_sales", "ws_bill_addr_sk",
                    "i_color in ('orchid','chiffon','lace')", 2000, 1, -8)
    + """)
  select  i_item_id ,cast(sum(total_sales) as double) total_sales
 from  (select * from ss
        union all
        select * from cs
        union all
        select * from ws) tmp1
 group by i_item_id
 order by total_sales,
          i_item_id
 limit 100
"""
)

# -- q57 (q57.sql: catalog year-over-year monthly sales vs call-center
#    average — q47's catalog twin; money outputs pinned) ---------------------
Q57_BODY = """
with v1 as(
 select i_category, i_brand,
        cc_name,
        d_year, d_moy,
        sum(cs_sales_price) sum_sales,
        avg(sum(cs_sales_price)) over
          (partition by i_category, i_brand,
                     cc_name, d_year)
          avg_monthly_sales,
        rank() over
          (partition by i_category, i_brand,
                     cc_name
           order by d_year, d_moy) rn
 from item, catalog_sales, date_dim, call_center
 where cs_item_sk = i_item_sk and
       cs_sold_date_sk = d_date_sk and
       cc_call_center_sk= cs_call_center_sk and
       (
         d_year = 2000 or
         ( d_year = 2000-1 and d_moy =12) or
         ( d_year = 2000+1 and d_moy =1)
       )
 group by i_category, i_brand,
          cc_name , d_year, d_moy),
 v2 as(
 select v1.cc_name
        ,v1.d_year, v1.d_moy
        ,v1.avg_monthly_sales
        ,v1.sum_sales, v1_lag.sum_sales psum, v1_lead.sum_sales nsum
 from v1, v1 v1_lag, v1 v1_lead
 where v1.i_category = v1_lag.i_category and
       v1.i_category = v1_lead.i_category and
       v1.i_brand = v1_lag.i_brand and
       v1.i_brand = v1_lead.i_brand and
       v1. cc_name = v1_lag. cc_name and
       v1. cc_name = v1_lead. cc_name and
       v1.rn = v1_lag.rn + 1 and
       v1.rn = v1_lead.rn - 1)
  select cc_name, d_year, d_moy
        ,round(cast(avg_monthly_sales as double), 6) avg_monthly_sales
        ,cast(sum_sales as double) sum_sales
        ,cast(psum as double) psum
        ,cast(nsum as double) nsum
 from v2
 where  d_year = 2000 and
        avg_monthly_sales > 0 and
        case when avg_monthly_sales > 0 then abs(sum_sales - avg_monthly_sales) / avg_monthly_sales else null end > 0.1
 order by sum_sales - avg_monthly_sales, nsum
 limit 100
"""

# -- q58 (q58.sql: items selling evenly across all three channels in one
#    week; ratio outputs pinned through double) ------------------------------
Q58_BODY = """
with ss_items as
 (select i_item_id item_id
        ,sum(ss_ext_sales_price) ss_item_rev
 from store_sales
     ,item
     ,date_dim
 where ss_item_sk = i_item_sk
   and d_date in (select d_date
                  from date_dim
                  where d_week_seq = (select d_week_seq
                                      from date_dim
                                      where d_date = '1998-02-19'))
   and ss_sold_date_sk   = d_date_sk
 group by i_item_id),
 cs_items as
 (select i_item_id item_id
        ,sum(cs_ext_sales_price) cs_item_rev
  from catalog_sales
      ,item
      ,date_dim
 where cs_item_sk = i_item_sk
  and  d_date in (select d_date
                  from date_dim
                  where d_week_seq = (select d_week_seq
                                      from date_dim
                                      where d_date = '1998-02-19'))
  and  cs_sold_date_sk = d_date_sk
 group by i_item_id),
 ws_items as
 (select i_item_id item_id
        ,sum(ws_ext_sales_price) ws_item_rev
  from web_sales
      ,item
      ,date_dim
 where ws_item_sk = i_item_sk
  and  d_date in (select d_date
                  from date_dim
                  where d_week_seq =(select d_week_seq
                                     from date_dim
                                     where d_date = '1998-02-19'))
  and ws_sold_date_sk   = d_date_sk
 group by i_item_id)
  select  ss_items.item_id
       ,cast(ss_item_rev as double) ss_item_rev
       ,round(cast(ss_item_rev as double)/(cast(ss_item_rev+cs_item_rev+ws_item_rev as double)/3) * 100,6) ss_dev
       ,cast(cs_item_rev as double) cs_item_rev
       ,round(cast(cs_item_rev as double)/(cast(ss_item_rev+cs_item_rev+ws_item_rev as double)/3) * 100,6) cs_dev
       ,cast(ws_item_rev as double) ws_item_rev
       ,round(cast(ws_item_rev as double)/(cast(ss_item_rev+cs_item_rev+ws_item_rev as double)/3) * 100,6) ws_dev
       ,round(cast(ss_item_rev+cs_item_rev+ws_item_rev as double)/3,6) average
 from ss_items,cs_items,ws_items
 where ss_items.item_id=cs_items.item_id
   and ss_items.item_id=ws_items.item_id
   and ss_item_rev between 0.9 * cs_item_rev and 1.1 * cs_item_rev
   and ss_item_rev between 0.9 * ws_item_rev and 1.1 * ws_item_rev
   and cs_item_rev between 0.9 * ss_item_rev and 1.1 * ss_item_rev
   and cs_item_rev between 0.9 * ws_item_rev and 1.1 * ws_item_rev
   and ws_item_rev between 0.9 * ss_item_rev and 1.1 * ss_item_rev
   and ws_item_rev between 0.9 * cs_item_rev and 1.1 * cs_item_rev
 order by ss_items.item_id
         ,ss_item_rev
 limit 100
"""

# -- q60 (q60.sql: Children-category sales across all three channels) --------
Q60_BODY = (
    "with ss as ("
    + _q333_channel("ss", "store_sales", "ss_addr_sk",
                    "i_category in ('Children')", 1999, 9, -6)
    + "),\n cs as ("
    + _q333_channel("cs", "catalog_sales", "cs_bill_addr_sk",
                    "i_category in ('Children')", 1999, 9, -6)
    + "),\n ws as ("
    + _q333_channel("ws", "web_sales", "ws_bill_addr_sk",
                    "i_category in ('Children')", 1999, 9, -6)
    + """)
  select
  i_item_id
,cast(sum(total_sales) as double) total_sales
 from  (select * from ss
        union all
        select * from cs
        union all
        select * from ws) tmp1
 group by i_item_id
 order by i_item_id
      ,total_sales
 limit 100
"""
)

# -- q62 (q62.sql: web ship-lag day bands; quoted aliases renamed,
#    SUM(int) -> BIGINT, leading substr aliased) -----------------------------
Q62_BODY = """
select
   substr(w_warehouse_name,1,20) w_warehouse_name_20
  ,sm_type
  ,web_name
  ,cast(sum(case when (ws_ship_date_sk - ws_sold_date_sk <= 30 ) then 1 else 0 end) as bigint)  as d30
  ,cast(sum(case when (ws_ship_date_sk - ws_sold_date_sk > 30) and
                 (ws_ship_date_sk - ws_sold_date_sk <= 60) then 1 else 0 end ) as bigint)  as d31_60
  ,cast(sum(case when (ws_ship_date_sk - ws_sold_date_sk > 60) and
                 (ws_ship_date_sk - ws_sold_date_sk <= 90) then 1 else 0 end) as bigint)  as d61_90
  ,cast(sum(case when (ws_ship_date_sk - ws_sold_date_sk > 90) and
                 (ws_ship_date_sk - ws_sold_date_sk <= 120) then 1 else 0 end) as bigint)  as d91_120
  ,cast(sum(case when (ws_ship_date_sk - ws_sold_date_sk  > 120) then 1 else 0 end) as bigint)  as d120_plus
from
   web_sales
  ,warehouse
  ,ship_mode
  ,web_site
  ,date_dim
where
    d_month_seq between 1212 and 1212 + 11
and ws_ship_date_sk   = d_date_sk
and ws_warehouse_sk   = w_warehouse_sk
and ws_ship_mode_sk   = sm_ship_mode_sk
and ws_web_site_sk    = web_site_sk
group by
   substr(w_warehouse_name,1,20)
  ,sm_type
  ,web_name
order by substr(w_warehouse_name,1,20)
        ,sm_type
       ,web_name
limit 100
"""

# -- q64 (q64.sql: returned-item repurchase panel joined across two years;
#    money sums pinned to double in the final projection) --------------------
Q64_BODY = """
with cs_ui as
 (select cs_item_sk
        ,sum(cs_ext_list_price) as sale,sum(cr_refunded_cash+cr_reversed_charge+cr_store_credit) as refund
  from catalog_sales
      ,catalog_returns
  where cs_item_sk = cr_item_sk
    and cs_order_number = cr_order_number
  group by cs_item_sk
  having sum(cs_ext_list_price)>2*sum(cr_refunded_cash+cr_reversed_charge+cr_store_credit)),
cross_sales as
 (select i_product_name product_name
     ,i_item_sk item_sk
     ,s_store_name store_name
     ,s_zip store_zip
     ,ad1.ca_street_number b_street_number
     ,ad1.ca_street_name b_street_name
     ,ad1.ca_city b_city
     ,ad1.ca_zip b_zip
     ,ad2.ca_street_number c_street_number
     ,ad2.ca_street_name c_street_name
     ,ad2.ca_city c_city
     ,ad2.ca_zip c_zip
     ,d1.d_year as syear
     ,d2.d_year as fsyear
     ,d3.d_year s2year
     ,count(*) cnt
     ,sum(ss_wholesale_cost) s1
     ,sum(ss_list_price) s2
     ,sum(ss_coupon_amt) s3
  FROM   store_sales
        ,store_returns
        ,cs_ui
        ,date_dim d1
        ,date_dim d2
        ,date_dim d3
        ,store
        ,customer
        ,customer_demographics cd1
        ,customer_demographics cd2
        ,promotion
        ,household_demographics hd1
        ,household_demographics hd2
        ,customer_address ad1
        ,customer_address ad2
        ,income_band ib1
        ,income_band ib2
        ,item
  WHERE  ss_store_sk = s_store_sk AND
         ss_sold_date_sk = d1.d_date_sk AND
         ss_customer_sk = c_customer_sk AND
         ss_cdemo_sk= cd1.cd_demo_sk AND
         ss_hdemo_sk = hd1.hd_demo_sk AND
         ss_addr_sk = ad1.ca_address_sk and
         ss_item_sk = i_item_sk and
         ss_item_sk = sr_item_sk and
         ss_ticket_number = sr_ticket_number and
         ss_item_sk = cs_ui.cs_item_sk and
         c_current_cdemo_sk = cd2.cd_demo_sk AND
         c_current_hdemo_sk = hd2.hd_demo_sk AND
         c_current_addr_sk = ad2.ca_address_sk and
         c_first_sales_date_sk = d2.d_date_sk and
         c_first_shipto_date_sk = d3.d_date_sk and
         ss_promo_sk = p_promo_sk and
         hd1.hd_income_band_sk = ib1.ib_income_band_sk and
         hd2.hd_income_band_sk = ib2.ib_income_band_sk and
         cd1.cd_marital_status <> cd2.cd_marital_status and
         i_color in ('maroon','burnished','dim','steel','navajo','chocolate') and
         i_current_price between 35 and 35 + 10 and
         i_current_price between 35 + 1 and 35 + 15
group by i_product_name
       ,i_item_sk
       ,s_store_name
       ,s_zip
       ,ad1.ca_street_number
       ,ad1.ca_street_name
       ,ad1.ca_city
       ,ad1.ca_zip
       ,ad2.ca_street_number
       ,ad2.ca_street_name
       ,ad2.ca_city
       ,ad2.ca_zip
       ,d1.d_year
       ,d2.d_year
       ,d3.d_year
)
select cs1.product_name
     ,cs1.store_name
     ,cs1.store_zip
     ,cs1.b_street_number
     ,cs1.b_street_name
     ,cs1.b_city
     ,cs1.b_zip
     ,cs1.c_street_number
     ,cs1.c_street_name
     ,cs1.c_city
     ,cs1.c_zip
     ,cs1.syear
     ,cs1.cnt
     ,cast(cs1.s1 as double) as s11
     ,cast(cs1.s2 as double) as s21
     ,cast(cs1.s3 as double) as s31
     ,cast(cs2.s1 as double) as s12
     ,cast(cs2.s2 as double) as s22
     ,cast(cs2.s3 as double) as s32
     ,cs2.syear syear_2
     ,cs2.cnt cnt_2
from cross_sales cs1,cross_sales cs2
where cs1.item_sk=cs2.item_sk and
     cs1.syear = 2000 and
     cs2.syear = 2000 + 1 and
     cs2.cnt <= cs1.cnt and
     cs1.store_name = cs2.store_name and
     cs1.store_zip = cs2.store_zip
order by cs1.product_name
       ,cs1.store_name
       ,cs2.cnt
       ,cs1.s1
       ,cs2.s1
"""

# -- q66 (q66.sql: 12-month warehouse shipping pivot over web+catalog;
#    `year` alias renamed `yr`, money sums pinned to double) -----------------
_MONTHS = ["jan", "feb", "mar", "apr", "may", "jun",
           "jul", "aug", "sep", "oct", "nov", "dec"]


def _q66_channel(pre: str, fact: str, sales_col: str, net_col: str) -> str:
    sales = "\n".join(
        f" 	,sum(case when d_moy = {k + 1}"
        f" 		then {sales_col}* {pre}_quantity else 0 end) as {mo}_sales"
        for k, mo in enumerate(_MONTHS)
    )
    net = "\n".join(
        f" 	,sum(case when d_moy = {k + 1}"
        f" 		then {net_col} * {pre}_quantity else 0 end) as {mo}_net"
        for k, mo in enumerate(_MONTHS)
    )
    return f"""
     select
 	w_warehouse_name
 	,w_warehouse_sq_ft
 	,w_city
 	,w_county
 	,w_state
 	,w_country
 	,'DIAMOND' || ',' || 'AIRBORNE' as ship_carriers
       ,d_year as yr
{sales}
{net}
     from
          {fact}
         ,warehouse
         ,date_dim
         ,time_dim
 	  ,ship_mode
     where
            {pre}_warehouse_sk =  w_warehouse_sk
        and {pre}_sold_date_sk = d_date_sk
        and {pre}_sold_time_sk = t_time_sk
 	and {pre}_ship_mode_sk = sm_ship_mode_sk
        and d_year = 2002
 	and t_time between 49530 and 49530+28800
 	and sm_carrier in ('DIAMOND','AIRBORNE')
     group by
        w_warehouse_name
 	,w_warehouse_sq_ft
 	,w_city
 	,w_county
 	,w_state
 	,w_country
       ,d_year"""


_Q66_OUT = (
    "\n".join(
        f" 	,cast(sum({mo}_sales) as double) as {mo}_sales" for mo in _MONTHS
    )
    + "\n"
    + "\n".join(
        f" 	,round(cast(sum({mo}_sales/w_warehouse_sq_ft) as double),6)"
        f" as {mo}_sales_per_sq_foot"
        for mo in _MONTHS
    )
    + "\n"
    + "\n".join(
        f" 	,cast(sum({mo}_net) as double) as {mo}_net" for mo in _MONTHS
    )
)

Q66_BODY = (
    """
select
         w_warehouse_name
 	,w_warehouse_sq_ft
 	,w_city
 	,w_county
 	,w_state
 	,w_country
        ,ship_carriers
        ,yr
"""
    + _Q66_OUT
    + "\n from ("
    + _q66_channel("ws", "web_sales", "ws_sales_price", "ws_net_paid_inc_tax")
    + "\n union all"
    + _q66_channel("cs", "catalog_sales", "cs_ext_sales_price", "cs_net_paid_inc_ship_tax")
    + """
 ) x
 group by
        w_warehouse_name
 	,w_warehouse_sq_ft
 	,w_city
 	,w_county
 	,w_state
 	,w_country
 	,ship_carriers
       ,yr
 order by w_warehouse_name
 limit 100
"""
)

_BODIES = {
    "tpcds_real_q4": Q4_BODY,
    "tpcds_real_q32": Q32_BODY,
    "tpcds_real_q51": Q51_BODY,
    "tpcds_real_q54": Q54_BODY,
    "tpcds_real_q56": Q56_BODY,
    "tpcds_real_q57": Q57_BODY,
    "tpcds_real_q58": Q58_BODY,
    "tpcds_real_q60": Q60_BODY,
    "tpcds_real_q62": Q62_BODY,
    "tpcds_real_q64": Q64_BODY,
    "tpcds_real_q66": Q66_BODY,
}

QUERIES: dict[str, QuerySpec] = {
    name: QuerySpec(_spark_runner(body), _oracle(body))
    for name, body in _BODIES.items()
}
