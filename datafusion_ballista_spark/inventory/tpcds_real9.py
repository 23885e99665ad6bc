"""Verbatim TPC-DS queries over the real star schema, tranche 9 (q84-q99)
— completes the full 99-query suite.

Reference: benchmarks/queries-tpcds/q{84,85,86,87,90,91,92,93,94,95,97,
99}.sql (CI suite .github/workflows/tpcds.yml:55-74), over star fixture
v4. Same fidelity contract / deviation classes as the earlier tranches:
single-quoted aliases renamed to bare identifiers (q92/q94/q95/q99),
AVG rewritten through sum/count (q85), decimal-ratio casts re-pinned to
double (q90 — engines' decimal-division scales differ), SUM(int) pinned
to BIGINT, INTERVAL endpoints precomputed.
"""

from __future__ import annotations

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.tpcds_real import _oracle, _spark_runner

# -- q84 (q84.sql: income-band customer lookup via store returns) ------------
Q84_BODY = """
select  c_customer_id as customer_id
       , coalesce(c_last_name,'') || ', ' || coalesce(c_first_name,'') as customername
 from customer
     ,customer_address
     ,customer_demographics
     ,household_demographics
     ,income_band
     ,store_returns
 where ca_city	        =  'Hopewell'
   and c_current_addr_sk = ca_address_sk
   and ib_lower_bound   >=  32287
   and ib_upper_bound   <=  32287 + 50000
   and ib_income_band_sk = hd_income_band_sk
   and cd_demo_sk = c_current_cdemo_sk
   and hd_demo_sk = c_current_hdemo_sk
   and sr_cdemo_sk = cd_demo_sk
 order by c_customer_id
 limit 100
"""

# -- q85 (q85.sql: web-return reason stats; avgs through sum/count,
#    outputs aliased, ORDER BY rewritten to the aliases) ---------------------
Q85_BODY = """
select  substr(r_reason_desc,1,20) r_reason_desc_20
       ,round(cast(sum(cast(ws_quantity as decimal(18,2))) as double)/count(ws_quantity),6) avg_quantity
       ,round(cast(sum(wr_refunded_cash) as double)/count(wr_refunded_cash),6) avg_refunded_cash
       ,round(cast(sum(wr_fee) as double)/count(wr_fee),6) avg_fee
 from web_sales, web_returns, web_page, customer_demographics cd1,
      customer_demographics cd2, customer_address, date_dim, reason
 where ws_web_page_sk = wp_web_page_sk
   and ws_item_sk = wr_item_sk
   and ws_order_number = wr_order_number
   and ws_sold_date_sk = d_date_sk and d_year = 1998
   and cd1.cd_demo_sk = wr_refunded_cdemo_sk
   and cd2.cd_demo_sk = wr_returning_cdemo_sk
   and ca_address_sk = wr_refunded_addr_sk
   and r_reason_sk = wr_reason_sk
   and
   (
    (
     cd1.cd_marital_status = 'M'
     and
     cd1.cd_marital_status = cd2.cd_marital_status
     and
     cd1.cd_education_status = '4 yr Degree'
     and
     cd1.cd_education_status = cd2.cd_education_status
     and
     ws_sales_price between 100.00 and 150.00
    )
   or
    (
     cd1.cd_marital_status = 'D'
     and
     cd1.cd_marital_status = cd2.cd_marital_status
     and
     cd1.cd_education_status = 'Primary'
     and
     cd1.cd_education_status = cd2.cd_education_status
     and
     ws_sales_price between 50.00 and 100.00
    )
   or
    (
     cd1.cd_marital_status = 'U'
     and
     cd1.cd_marital_status = cd2.cd_marital_status
     and
     cd1.cd_education_status = 'Advanced Degree'
     and
     cd1.cd_education_status = cd2.cd_education_status
     and
     ws_sales_price between 150.00 and 200.00
    )
   )
   and
   (
    (
     ca_country = 'United States'
     and
     ca_state in ('KY', 'GA', 'NM')
     and ws_net_profit between 100 and 200
    )
    or
    (
     ca_country = 'United States'
     and
     ca_state in ('MT', 'OR', 'IN')
     and ws_net_profit between 150 and 300
    )
    or
    (
     ca_country = 'United States'
     and
     ca_state in ('WI', 'MO', 'WV')
     and ws_net_profit between 50 and 250
    )
   )
group by r_reason_desc
order by r_reason_desc_20
        ,avg_quantity
        ,avg_refunded_cash
        ,avg_fee
limit 100
"""

# -- q86 (q86.sql: web net-paid rollup with rank-within-parent; 51 result
#    rows < LIMIT so the sort never truncates) -------------------------------
Q86_BODY = """
select
    cast(sum(ws_net_paid) as double) as total_sum
   ,i_category
   ,i_class
   ,grouping(i_category)+grouping(i_class) as lochierarchy
   ,rank() over (
 	partition by grouping(i_category)+grouping(i_class),
 	case when grouping(i_class) = 0 then i_category end
 	order by sum(ws_net_paid) desc) as rank_within_parent
 from
    web_sales
   ,date_dim       d1
   ,item
 where
    d1.d_month_seq between 1212 and 1212+11
 and d1.d_date_sk = ws_sold_date_sk
 and i_item_sk  = ws_item_sk
 group by rollup(i_category,i_class)
 order by
   lochierarchy desc,
   case when lochierarchy = 0 then i_category end,
   rank_within_parent
 limit 100
"""

# -- q87 (q87.sql: store-only same-day customers via EXCEPT chain) -----------
Q87_BODY = """
select count(*) cnt
from ((select distinct c_last_name, c_first_name, d_date
       from store_sales, date_dim, customer
       where store_sales.ss_sold_date_sk = date_dim.d_date_sk
         and store_sales.ss_customer_sk = customer.c_customer_sk
         and d_month_seq between 1212 and 1212+11)
       except
      (select distinct c_last_name, c_first_name, d_date
       from catalog_sales, date_dim, customer
       where catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
         and catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
         and d_month_seq between 1212 and 1212+11)
       except
      (select distinct c_last_name, c_first_name, d_date
       from web_sales, date_dim, customer
       where web_sales.ws_sold_date_sk = date_dim.d_date_sk
         and web_sales.ws_bill_customer_sk = customer.c_customer_sk
         and d_month_seq between 1212 and 1212+11)
) cool_cust
"""

# -- q90 (q90.sql: web AM/PM activity ratio; decimal(15,4) casts re-pinned
#    to double — decimal-division scale rules differ between engines) --------
Q90_BODY = """
select  round(cast(amc as double)/cast(pmc as double),6) am_pm_ratio
 from ( select count(*) amc
       from web_sales, household_demographics , time_dim, web_page
       where ws_sold_time_sk = time_dim.t_time_sk
         and ws_ship_hdemo_sk = household_demographics.hd_demo_sk
         and ws_web_page_sk = web_page.wp_web_page_sk
         and time_dim.t_hour between 6 and 6+1
         and household_demographics.hd_dep_count = 8
         and web_page.wp_char_count between 5000 and 5200) at,
      ( select count(*) pmc
       from web_sales, household_demographics , time_dim, web_page
       where ws_sold_time_sk = time_dim.t_time_sk
         and ws_ship_hdemo_sk = household_demographics.hd_demo_sk
         and ws_web_page_sk = web_page.wp_web_page_sk
         and time_dim.t_hour between 14 and 14+1
         and household_demographics.hd_dep_count = 8
         and web_page.wp_char_count between 5000 and 5200) pt
 order by am_pm_ratio
 limit 100
"""

# -- q91 (q91.sql: call-center return losses by demographic cohort) ----------
Q91_BODY = """
select
        cc_call_center_id Call_Center,
        cc_name Call_Center_Name,
        cc_manager Manager,
        cast(sum(cr_net_loss) as double) Returns_Loss
from
        call_center,
        catalog_returns,
        date_dim,
        customer,
        customer_address,
        customer_demographics,
        household_demographics
where
        cr_call_center_sk       = cc_call_center_sk
and     cr_returned_date_sk     = d_date_sk
and     cr_returning_customer_sk= c_customer_sk
and     cd_demo_sk              = c_current_cdemo_sk
and     hd_demo_sk              = c_current_hdemo_sk
and     ca_address_sk           = c_current_addr_sk
and     d_year                  = 1999
and     d_moy                   = 11
and     ( (cd_marital_status       = 'M' and cd_education_status     = 'Unknown')
        or(cd_marital_status       = 'W' and cd_education_status     = 'Advanced Degree'))
and     hd_buy_potential like '0-500%'
and     ca_gmt_offset           = -7
group by cc_call_center_id,cc_name,cc_manager,cd_marital_status,cd_education_status
order by sum(cr_net_loss) desc
"""

# -- q92 (q92.sql: excess web discounts vs 1.3x item average; quoted alias
#    renamed, endpoints precomputed ('1998-06-16')) --------------------------
Q92_BODY = """
select
   cast(sum(ws_ext_discount_amt) as double)  as excess_discount_amount
from
    web_sales
   ,item
   ,date_dim
where
i_manufact_id = 269
and i_item_sk = ws_item_sk
and d_date between cast('1998-03-18' as date) and
        cast('1998-06-16' as date)
and d_date_sk = ws_sold_date_sk
and ws_ext_discount_amt
     > (
         SELECT
            1.3 * avg(ws_ext_discount_amt)
         FROM
            web_sales
           ,date_dim
         WHERE
              ws_item_sk = i_item_sk
          and d_date between cast('1998-03-18' as date) and
                             cast('1998-06-16' as date)
          and d_date_sk = ws_sold_date_sk
      )
order by sum(ws_ext_discount_amt)
limit 100
"""

# -- q93 (q93.sql: net-of-returns customer spend for one return reason) ------
Q93_BODY = """
select  ss_customer_sk
            ,cast(sum(act_sales) as double) sumsales
      from (select ss_item_sk
                  ,ss_ticket_number
                  ,ss_customer_sk
                  ,case when sr_return_quantity is not null then (ss_quantity-sr_return_quantity)*ss_sales_price
                                                            else (ss_quantity*ss_sales_price) end act_sales
            from store_sales left outer join store_returns on (sr_item_sk = ss_item_sk
                                                               and sr_ticket_number = ss_ticket_number)
                ,reason
            where sr_reason_sk = r_reason_sk
              and r_reason_desc = 'Did not like the warranty') t
      group by ss_customer_sk
      order by sumsales, ss_customer_sk
limit 100
"""

# -- q94 (q94.sql: multi-warehouse unreturned web orders; quoted aliases
#    renamed, endpoint precomputed ('1999-06-30')) ---------------------------
Q94_BODY = """
select
   count(distinct ws_order_number) as order_count
  ,cast(sum(ws_ext_ship_cost) as double) as total_shipping_cost
  ,cast(sum(ws_net_profit) as double) as total_net_profit
from
   web_sales ws1
  ,date_dim
  ,customer_address
  ,web_site
where
    d_date between cast('1999-05-01' as date) and
           cast('1999-06-30' as date)
and ws1.ws_ship_date_sk = d_date_sk
and ws1.ws_ship_addr_sk = ca_address_sk
and ca_state = 'TX'
and ws1.ws_web_site_sk = web_site_sk
and web_company_name = 'pri'
and exists (select *
            from web_sales ws2
            where ws1.ws_order_number = ws2.ws_order_number
              and ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
and not exists(select *
               from web_returns wr1
               where ws1.ws_order_number = wr1.wr_order_number)
order by count(distinct ws_order_number)
limit 100
"""

# -- q95 (q95.sql: returned multi-warehouse web orders via the ws_wh
#    self-join CTE; quoted aliases renamed, endpoint precomputed) ------------
Q95_BODY = """
with ws_wh as
(select ws1.ws_order_number,ws1.ws_warehouse_sk wh1,ws2.ws_warehouse_sk wh2
 from web_sales ws1,web_sales ws2
 where ws1.ws_order_number = ws2.ws_order_number
   and ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
 select
   count(distinct ws_order_number) as order_count
  ,cast(sum(ws_ext_ship_cost) as double) as total_shipping_cost
  ,cast(sum(ws_net_profit) as double) as total_net_profit
from
   web_sales ws1
  ,date_dim
  ,customer_address
  ,web_site
where
    d_date between cast('1999-05-01' as date) and
           cast('1999-06-30' as date)
and ws1.ws_ship_date_sk = d_date_sk
and ws1.ws_ship_addr_sk = ca_address_sk
and ca_state = 'TX'
and ws1.ws_web_site_sk = web_site_sk
and web_company_name = 'pri'
and ws1.ws_order_number in (select ws_order_number
                            from ws_wh)
and ws1.ws_order_number in (select wr_order_number
                            from web_returns,ws_wh
                            where wr_order_number = ws_wh.ws_order_number)
order by count(distinct ws_order_number)
limit 100
"""

# -- q97 (q97.sql: store/catalog customer-item overlap via full outer
#    join; SUM(int) -> BIGINT) -----------------------------------------------
Q97_BODY = """
with ssci as (
select ss_customer_sk customer_sk
      ,ss_item_sk item_sk
from store_sales,date_dim
where ss_sold_date_sk = d_date_sk
  and d_month_seq between 1212 and 1212 + 11
group by ss_customer_sk
        ,ss_item_sk),
csci as(
 select cs_bill_customer_sk customer_sk
      ,cs_item_sk item_sk
from catalog_sales,date_dim
where cs_sold_date_sk = d_date_sk
  and d_month_seq between 1212 and 1212 + 11
group by cs_bill_customer_sk
        ,cs_item_sk)
 select  cast(sum(case when ssci.customer_sk is not null and csci.customer_sk is null then 1 else 0 end) as bigint) store_only
      ,cast(sum(case when ssci.customer_sk is null and csci.customer_sk is not null then 1 else 0 end) as bigint) catalog_only
      ,cast(sum(case when ssci.customer_sk is not null and csci.customer_sk is not null then 1 else 0 end) as bigint) store_and_catalog
from ssci full outer join csci on (ssci.customer_sk=csci.customer_sk
                               and ssci.item_sk = csci.item_sk)
limit 100
"""

# -- q99 (q99.sql: catalog ship-lag day bands; quoted aliases renamed,
#    SUM(int) -> BIGINT, leading substr aliased) -----------------------------
Q99_BODY = """
select
   substr(w_warehouse_name,1,20) w_warehouse_name_20
  ,sm_type
  ,cc_name
  ,cast(sum(case when (cs_ship_date_sk - cs_sold_date_sk <= 30 ) then 1 else 0 end) as bigint)  as d30
  ,cast(sum(case when (cs_ship_date_sk - cs_sold_date_sk > 30) and
                 (cs_ship_date_sk - cs_sold_date_sk <= 60) then 1 else 0 end ) as bigint)  as d31_60
  ,cast(sum(case when (cs_ship_date_sk - cs_sold_date_sk > 60) and
                 (cs_ship_date_sk - cs_sold_date_sk <= 90) then 1 else 0 end) as bigint)  as d61_90
  ,cast(sum(case when (cs_ship_date_sk - cs_sold_date_sk > 90) and
                 (cs_ship_date_sk - cs_sold_date_sk <= 120) then 1 else 0 end) as bigint)  as d91_120
  ,cast(sum(case when (cs_ship_date_sk - cs_sold_date_sk  > 120) then 1 else 0 end) as bigint)  as d120_plus
from
   catalog_sales
  ,warehouse
  ,ship_mode
  ,call_center
  ,date_dim
where
    d_month_seq between 1212 and 1212 + 11
and cs_ship_date_sk   = d_date_sk
and cs_warehouse_sk   = w_warehouse_sk
and cs_ship_mode_sk   = sm_ship_mode_sk
and cs_call_center_sk = cc_call_center_sk
group by
   substr(w_warehouse_name,1,20)
  ,sm_type
  ,cc_name
order by substr(w_warehouse_name,1,20)
        ,sm_type
        ,cc_name
limit 100
"""

_BODIES = {
    "tpcds_real_q84": Q84_BODY,
    "tpcds_real_q85": Q85_BODY,
    "tpcds_real_q86": Q86_BODY,
    "tpcds_real_q87": Q87_BODY,
    "tpcds_real_q90": Q90_BODY,
    "tpcds_real_q91": Q91_BODY,
    "tpcds_real_q92": Q92_BODY,
    "tpcds_real_q93": Q93_BODY,
    "tpcds_real_q94": Q94_BODY,
    "tpcds_real_q95": Q95_BODY,
    "tpcds_real_q97": Q97_BODY,
    "tpcds_real_q99": Q99_BODY,
}

QUERIES: dict[str, QuerySpec] = {
    name: QuerySpec(_spark_runner(body), _oracle(body))
    for name, body in _BODIES.items()
}
