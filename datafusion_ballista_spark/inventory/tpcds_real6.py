"""Verbatim TPC-DS queries over the real star schema, tranche 6 (q31-q50).

Reference: benchmarks/queries-tpcds/q{31,33,35,37,38,39,40,45,49,50}.sql
(CI suite .github/workflows/tpcds.yml:55-74), over star fixture v4.
Same fidelity contract / deviation classes as the earlier tranches.
q39 ships two statement variants; the FIRST is ported, with its
duplicate inv2 output columns aliased ``*_2`` (name-collapsing row
fetches lose twin-named columns — alias-class deviation). q49's inner
``cast(... as decimal(15,4))`` ratio casts are re-pinned to DOUBLE: the
engines' decimal-division result scales differ, which can flip rank()
ties that the decimal(15,4) text would otherwise produce. q50's
single-quoted day-band aliases are renamed to bare identifiers.
"""

from __future__ import annotations

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.tpcds_real import _oracle, _spark_runner

# -- q31 (q31.sql: county store-vs-web quarter-over-quarter growth) ----------
Q31_BODY = """
with ss as
 (select ca_county,d_qoy, d_year,sum(ss_ext_sales_price) as store_sales
 from store_sales,date_dim,customer_address
 where ss_sold_date_sk = d_date_sk
  and ss_addr_sk=ca_address_sk
 group by ca_county,d_qoy, d_year),
 ws as
 (select ca_county,d_qoy, d_year,sum(ws_ext_sales_price) as web_sales
 from web_sales,date_dim,customer_address
 where ws_sold_date_sk = d_date_sk
  and ws_bill_addr_sk=ca_address_sk
 group by ca_county,d_qoy, d_year)
 select
        ss1.ca_county
       ,ss1.d_year
       ,round(cast(ws2.web_sales as double)/cast(ws1.web_sales as double),6) web_q1_q2_increase
       ,round(cast(ss2.store_sales as double)/cast(ss1.store_sales as double),6) store_q1_q2_increase
       ,round(cast(ws3.web_sales as double)/cast(ws2.web_sales as double),6) web_q2_q3_increase
       ,round(cast(ss3.store_sales as double)/cast(ss2.store_sales as double),6) store_q2_q3_increase
 from
        ss ss1
       ,ss ss2
       ,ss ss3
       ,ws ws1
       ,ws ws2
       ,ws ws3
 where
    ss1.d_qoy = 1
    and ss1.d_year = 2000
    and ss1.ca_county = ss2.ca_county
    and ss2.d_qoy = 2
    and ss2.d_year = 2000
 and ss2.ca_county = ss3.ca_county
    and ss3.d_qoy = 3
    and ss3.d_year = 2000
    and ss1.ca_county = ws1.ca_county
    and ws1.d_qoy = 1
    and ws1.d_year = 2000
    and ws1.ca_county = ws2.ca_county
    and ws2.d_qoy = 2
    and ws2.d_year = 2000
    and ws1.ca_county = ws3.ca_county
    and ws3.d_qoy = 3
    and ws3.d_year =2000
    and case when ws1.web_sales > 0 then ws2.web_sales/ws1.web_sales else null end
       > case when ss1.store_sales > 0 then ss2.store_sales/ss1.store_sales else null end
    and case when ws2.web_sales > 0 then ws3.web_sales/ws2.web_sales else null end
       > case when ss2.store_sales > 0 then ss3.store_sales/ss2.store_sales else null end
 order by ss1.d_year
"""

# -- q33 (q33.sql: Books-manufacturer sales across all three channels) -------
Q33_BODY = """
with ss as (
 select
          i_manufact_id,sum(ss_ext_sales_price) total_sales
 from
 	store_sales,
 	date_dim,
         customer_address,
         item
 where
         i_manufact_id in (select
  i_manufact_id
from
 item
where i_category in ('Books'))
 and     ss_item_sk              = i_item_sk
 and     ss_sold_date_sk         = d_date_sk
 and     d_year                  = 1999
 and     d_moy                   = 3
 and     ss_addr_sk              = ca_address_sk
 and     ca_gmt_offset           = -6
 group by i_manufact_id),
 cs as (
 select
          i_manufact_id,sum(cs_ext_sales_price) total_sales
 from
 	catalog_sales,
 	date_dim,
         customer_address,
         item
 where
         i_manufact_id               in (select
  i_manufact_id
from
 item
where i_category in ('Books'))
 and     cs_item_sk              = i_item_sk
 and     cs_sold_date_sk         = d_date_sk
 and     d_year                  = 1999
 and     d_moy                   = 3
 and     cs_bill_addr_sk         = ca_address_sk
 and     ca_gmt_offset           = -6
 group by i_manufact_id),
 ws as (
 select
          i_manufact_id,sum(ws_ext_sales_price) total_sales
 from
 	web_sales,
 	date_dim,
         customer_address,
         item
 where
         i_manufact_id               in (select
  i_manufact_id
from
 item
where i_category in ('Books'))
 and     ws_item_sk              = i_item_sk
 and     ws_sold_date_sk         = d_date_sk
 and     d_year                  = 1999
 and     d_moy                   = 3
 and     ws_bill_addr_sk         = ca_address_sk
 and     ca_gmt_offset           = -6
 group by i_manufact_id)
  select  i_manufact_id ,cast(sum(total_sales) as double) total_sales
 from  (select * from ss
        union all
        select * from cs
        union all
        select * from ws) tmp1
 group by i_manufact_id
 order by total_sales
limit 100
"""

# -- q35 (q35.sql: demographic census with per-group dep stats; unnamed
#    avg/max/sum outputs aliased, SUM(int) -> BIGINT, avg via sum/count) -----
Q35_BODY = """
select
  ca_state,
  cd_gender,
  cd_marital_status,
  cd_dep_count,
  count(*) cnt1,
  round(cast(sum(cast(cd_dep_count as decimal(18,2))) as double)/count(*),6) avg1,
  max(cd_dep_count) max1,
  cast(sum(cd_dep_count) as bigint) sum1,
  cd_dep_employed_count,
  count(*) cnt2,
  round(cast(sum(cast(cd_dep_employed_count as decimal(18,2))) as double)/count(*),6) avg2,
  max(cd_dep_employed_count) max2,
  cast(sum(cd_dep_employed_count) as bigint) sum2,
  cd_dep_college_count,
  count(*) cnt3,
  round(cast(sum(cast(cd_dep_college_count as decimal(18,2))) as double)/count(*),6) avg3,
  max(cd_dep_college_count) max3,
  cast(sum(cd_dep_college_count) as bigint) sum3
 from
  customer c,customer_address ca,customer_demographics
 where
  c.c_current_addr_sk = ca.ca_address_sk and
  cd_demo_sk = c.c_current_cdemo_sk and
  exists (select *
          from store_sales,date_dim
          where c.c_customer_sk = ss_customer_sk and
                ss_sold_date_sk = d_date_sk and
                d_year = 1999 and
                d_qoy < 4) and
   (exists (select *
            from web_sales,date_dim
            where c.c_customer_sk = ws_bill_customer_sk and
                  ws_sold_date_sk = d_date_sk and
                  d_year = 1999 and
                  d_qoy < 4) or
    exists (select *
            from catalog_sales,date_dim
            where c.c_customer_sk = cs_ship_customer_sk and
                  cs_sold_date_sk = d_date_sk and
                  d_year = 1999 and
                  d_qoy < 4))
 group by ca_state,
          cd_gender,
          cd_marital_status,
          cd_dep_count,
          cd_dep_employed_count,
          cd_dep_college_count
 order by ca_state,
          cd_gender,
          cd_marital_status,
          cd_dep_count,
          cd_dep_employed_count,
          cd_dep_college_count
 limit 100
"""

# -- q37 (q37.sql: well-stocked catalog items; endpoint precomputed
#    ('2001-08-01')) ---------------------------------------------------------
Q37_BODY = """
select  i_item_id
       ,i_item_desc
       ,cast(i_current_price as double) as i_current_price
 from item, inventory, date_dim, catalog_sales
 where i_current_price between 22 and 22 + 30
 and inv_item_sk = i_item_sk
 and d_date_sk=inv_date_sk
 and d_date between cast('2001-06-02' as date) and cast('2001-08-01' as date)
 and i_manufact_id in (678,964,918,849)
 and inv_quantity_on_hand between 100 and 500
 and cs_item_sk = i_item_sk
 group by i_item_id,i_item_desc,i_current_price
 order by i_item_id
 limit 100
"""

# -- q38 (q38.sql: customers active same-day in all three channels) ----------
Q38_BODY = """
select  count(*) cnt from (
    select distinct c_last_name, c_first_name, d_date
    from store_sales, date_dim, customer
          where store_sales.ss_sold_date_sk = date_dim.d_date_sk
      and store_sales.ss_customer_sk = customer.c_customer_sk
      and d_month_seq between 1212 and 1212 + 11
  intersect
    select distinct c_last_name, c_first_name, d_date
    from catalog_sales, date_dim, customer
          where catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
      and catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
      and d_month_seq between 1212 and 1212 + 11
  intersect
    select distinct c_last_name, c_first_name, d_date
    from web_sales, date_dim, customer
          where web_sales.ws_sold_date_sk = date_dim.d_date_sk
      and web_sales.ws_bill_customer_sk = customer.c_customer_sk
      and d_month_seq between 1212 and 1212 + 11
) hot_cust
limit 100
"""

# -- q39 (q39.sql, FIRST variant: volatile-stock month-pair join; stddev
#    and mean rounded at 6dp — parallel merge order differs at ULP level) ----
Q39_BODY = """
with inv as
(select w_warehouse_name,w_warehouse_sk,i_item_sk,d_moy
       ,stdev,mean, case mean when 0 then null else round(stdev/mean,6) end cov
 from(select w_warehouse_name,w_warehouse_sk,i_item_sk,d_moy
            ,round(stddev_samp(inv_quantity_on_hand),6) stdev
            ,round(cast(sum(inv_quantity_on_hand) as double)
                   /count(inv_quantity_on_hand),6) mean
      from inventory
          ,item
          ,warehouse
          ,date_dim
      where inv_item_sk = i_item_sk
        and inv_warehouse_sk = w_warehouse_sk
        and inv_date_sk = d_date_sk
        and d_year =1998
      group by w_warehouse_name,w_warehouse_sk,i_item_sk,d_moy) foo
 where case mean when 0 then 0 else stdev/mean end > 1)
select inv1.w_warehouse_sk,inv1.i_item_sk,inv1.d_moy,inv1.mean, inv1.cov
        ,inv2.w_warehouse_sk w_warehouse_sk_2,inv2.i_item_sk i_item_sk_2
        ,inv2.d_moy d_moy_2,inv2.mean mean_2, inv2.cov cov_2
from inv inv1,inv inv2
where inv1.i_item_sk = inv2.i_item_sk
  and inv1.w_warehouse_sk =  inv2.w_warehouse_sk
  and inv1.d_moy=4
  and inv2.d_moy=4+1
order by inv1.w_warehouse_sk,inv1.i_item_sk,inv1.d_moy,inv1.mean,inv1.cov
        ,inv2.d_moy,inv2.mean, inv2.cov
"""

# -- q40 (q40.sql: warehouse net sales around the price-change date;
#    endpoints precomputed ('1998-03-09'/'1998-05-08')) ----------------------
Q40_BODY = """
select
   w_state
  ,i_item_id
  ,cast(sum(case when (cast(d_date as date) < cast ('1998-04-08' as date))
 		then cs_sales_price - coalesce(cr_refunded_cash,0) else 0 end) as double) as sales_before
  ,cast(sum(case when (cast(d_date as date) >= cast ('1998-04-08' as date))
 		then cs_sales_price - coalesce(cr_refunded_cash,0) else 0 end) as double) as sales_after
 from
   catalog_sales left outer join catalog_returns on
       (cs_order_number = cr_order_number
        and cs_item_sk = cr_item_sk)
  ,warehouse
  ,item
  ,date_dim
 where
     i_current_price between 0.99 and 1.49
 and i_item_sk          = cs_item_sk
 and cs_warehouse_sk    = w_warehouse_sk
 and cs_sold_date_sk    = d_date_sk
 and d_date between cast ('1998-03-09' as date)
                and cast ('1998-05-08' as date)
 group by
    w_state,i_item_id
 order by w_state,i_item_id
limit 100
"""

# -- q45 (q45.sql: web sales by zip neighborhood or prime-sk items) ----------
Q45_BODY = """
select  ca_zip, ca_county, cast(sum(ws_sales_price) as double) sum_sales
 from web_sales, customer, customer_address, date_dim, item
 where ws_bill_customer_sk = c_customer_sk
 	and c_current_addr_sk = ca_address_sk
 	and ws_item_sk = i_item_sk
 	and ( substr(ca_zip,1,5) in ('85669', '86197','88274','83405','86475', '85392', '85460', '80348', '81792')
 	      or
 	      i_item_id in (select i_item_id
                             from item
                             where i_item_sk in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)
                             )
 	    )
 	and ws_sold_date_sk = d_date_sk
 	and d_qoy = 2 and d_year = 2000
 group by ca_zip, ca_county
 order by ca_zip, ca_county
 limit 100
"""

# -- q49 (q49.sql: worst return ratios per channel; ratio casts re-pinned
#    to double (decimal-division scale rules differ between engines and
#    can flip rank() ties)) --------------------------------------------------


def _q49_channel(channel: str, alias: str, fact: str, ret: str, pre: str,
                 rpre: str, order_col: str, ticket: str, rticket: str) -> str:
    return f"""
 select
 '{channel}' as channel
 ,{alias}.item
 ,{alias}.return_ratio
 ,{alias}.return_rank
 ,{alias}.currency_rank
 from (
 	select
 	 item
 	,round(return_ratio,6) return_ratio
 	,round(currency_ratio,6) currency_ratio
 	,rank() over (order by return_ratio) as return_rank
 	,rank() over (order by currency_ratio) as currency_rank
 	from
 	(	select {alias}0.{pre}_item_sk as item
 		,(cast(sum(coalesce(r.{rpre}_return_quantity,0)) as double)/
 		cast(sum(coalesce({alias}0.{pre}_quantity,0)) as double)) as return_ratio
 		,(cast(sum(coalesce(r.{rpre}_{order_col},0)) as double)/
 		cast(sum(coalesce({alias}0.{pre}_net_paid,0)) as double)) as currency_ratio
 		from
 		 {fact} {alias}0 left outer join {ret} r
 			on ({alias}0.{ticket} = r.{rticket} and
 			{alias}0.{pre}_item_sk = r.{rpre}_item_sk)
                 ,date_dim
 		where
 			r.{rpre}_{order_col} > 10000
 			and {alias}0.{pre}_net_profit > 1
                         and {alias}0.{pre}_net_paid > 0
                         and {alias}0.{pre}_quantity > 0
                         and {pre}_sold_date_sk = d_date_sk
                         and d_year = 2000
                         and d_moy = 12
 		group by {alias}0.{pre}_item_sk
 	) in_{alias}
 ) {alias}
 where
 (
 {alias}.return_rank <= 10
 or
 {alias}.currency_rank <= 10
 )
"""


Q49_BODY = (
    "select  channel, item, return_ratio, return_rank, currency_rank from\n ("
    + _q49_channel("web", "web", "web_sales", "web_returns", "ws", "wr",
                   "return_amt", "ws_order_number", "wr_order_number")
    + " union "
    + _q49_channel("catalog", "ctl", "catalog_sales", "catalog_returns", "cs",
                   "cr", "return_amount", "cs_order_number", "cr_order_number")
    + " union "
    + _q49_channel("store", "st", "store_sales", "store_returns", "ss", "sr",
                   "return_amt", "ss_ticket_number", "sr_ticket_number")
    + ")\n order by 1,4,5,2\n limit 100\n"
)

# -- q50 (q50.sql: return-lag day bands per store; quoted aliases renamed,
#    SUM(int) -> BIGINT) -----------------------------------------------------
Q50_BODY = """
select
   s_store_name
  ,s_company_id
  ,s_street_number
  ,s_street_name
  ,s_street_type
  ,s_suite_number
  ,s_city
  ,s_county
  ,s_state
  ,s_zip
  ,cast(sum(case when (sr_returned_date_sk - ss_sold_date_sk <= 30 ) then 1 else 0 end) as bigint)  as d30
  ,cast(sum(case when (sr_returned_date_sk - ss_sold_date_sk > 30) and
                 (sr_returned_date_sk - ss_sold_date_sk <= 60) then 1 else 0 end ) as bigint)  as d31_60
  ,cast(sum(case when (sr_returned_date_sk - ss_sold_date_sk > 60) and
                 (sr_returned_date_sk - ss_sold_date_sk <= 90) then 1 else 0 end) as bigint)  as d61_90
  ,cast(sum(case when (sr_returned_date_sk - ss_sold_date_sk > 90) and
                 (sr_returned_date_sk - ss_sold_date_sk <= 120) then 1 else 0 end) as bigint)  as d91_120
  ,cast(sum(case when (sr_returned_date_sk - ss_sold_date_sk  > 120) then 1 else 0 end) as bigint)  as d120_plus
from
   store_sales
  ,store_returns
  ,store
  ,date_dim d1
  ,date_dim d2
where
    d2.d_year = 2000
and d2.d_moy  = 9
and ss_ticket_number = sr_ticket_number
and ss_item_sk = sr_item_sk
and ss_sold_date_sk   = d1.d_date_sk
and sr_returned_date_sk   = d2.d_date_sk
and ss_customer_sk = sr_customer_sk
and ss_store_sk = s_store_sk
group by
   s_store_name
  ,s_company_id
  ,s_street_number
  ,s_street_name
  ,s_street_type
  ,s_suite_number
  ,s_city
  ,s_county
  ,s_state
  ,s_zip
order by s_store_name
        ,s_company_id
        ,s_street_number
        ,s_street_name
        ,s_street_type
        ,s_suite_number
        ,s_city
        ,s_county
        ,s_state
        ,s_zip
limit 100
"""

_BODIES = {
    "tpcds_real_q31": Q31_BODY,
    "tpcds_real_q33": Q33_BODY,
    "tpcds_real_q35": Q35_BODY,
    "tpcds_real_q37": Q37_BODY,
    "tpcds_real_q38": Q38_BODY,
    "tpcds_real_q39": Q39_BODY,
    "tpcds_real_q40": Q40_BODY,
    "tpcds_real_q45": Q45_BODY,
    "tpcds_real_q49": Q49_BODY,
    "tpcds_real_q50": Q50_BODY,
}

QUERIES: dict[str, QuerySpec] = {
    name: QuerySpec(_spark_runner(body), _oracle(body))
    for name, body in _BODIES.items()
}
