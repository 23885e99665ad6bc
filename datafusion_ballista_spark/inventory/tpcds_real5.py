"""Verbatim TPC-DS queries over the real star schema, tranche 5 (q18-q30).

Reference: benchmarks/queries-tpcds/q{18,20,21,22,23,24,25,26,29,30}.sql
(CI suite .github/workflows/tpcds.yml:55-74), over star fixture v4.
Same fidelity contract / deviation classes as tpcds_real.py +
tpcds_real4.py. q23/q24 ship two statement variants per file; the FIRST
variant of each is ported (one query per entry, like the reference's
per-file runner). INTERVAL endpoints precomputed; SUM(int) pinned to
BIGINT (q21/q29 — DuckDB HUGEINT); AVG over decimal/nullable-int
rewritten through sum/count; truncating ROLLUP sorts pin NULLS FIRST.
"""

from __future__ import annotations

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.tpcds_real import _oracle, _spark_runner

# -- q18 (q18.sql: catalog demographics rollup; avgs in sum/count form,
#    NULLS FIRST pinned on the truncating rollup sort) -----------------------
Q18_BODY = """
select  i_item_id,
        ca_country,
        ca_state,
        ca_county,
        round(cast(sum(cast(cs_quantity as decimal(18,2))) as double)/count(*),6) agg1,
        round(cast(sum(cast(cs_list_price as decimal(18,2))) as double)/count(*),6) agg2,
        round(cast(sum(cast(cs_coupon_amt as decimal(18,2))) as double)/count(*),6) agg3,
        round(cast(sum(cast(cs_sales_price as decimal(18,2))) as double)/count(*),6) agg4,
        round(cast(sum(cast(cs_net_profit as decimal(18,2))) as double)/count(*),6) agg5,
        round(cast(sum(cast(c_birth_year as decimal(18,2))) as double)/count(*),6) agg6,
        round(cast(sum(cast(cd1.cd_dep_count as decimal(18,2))) as double)/count(*),6) agg7
 from catalog_sales, customer_demographics cd1,
      customer_demographics cd2, customer, customer_address, date_dim, item
 where cs_sold_date_sk = d_date_sk and
       cs_item_sk = i_item_sk and
       cs_bill_cdemo_sk = cd1.cd_demo_sk and
       cs_bill_customer_sk = c_customer_sk and
       cd1.cd_gender = 'M' and
       cd1.cd_education_status = 'College' and
       c_current_cdemo_sk = cd2.cd_demo_sk and
       c_current_addr_sk = ca_address_sk and
       c_birth_month in (9,5,12,4,1,10) and
       d_year = 2001 and
       ca_state in ('ND','WI','AL'
                   ,'NC','OK','MS','TN')
 group by rollup (i_item_id, ca_country, ca_state, ca_county)
 order by ca_country nulls first,
        ca_state nulls first,
        ca_county nulls first,
	i_item_id nulls first
 limit 100
"""

# -- q20 (q20.sql: catalog class revenue share; endpoint precomputed) --------
Q20_BODY = """
select  i_item_id
       ,i_item_desc
       ,i_category
       ,i_class
       ,cast(i_current_price as double) as i_current_price
       ,cast(sum(cs_ext_sales_price) as double) as itemrevenue
       ,round(cast(sum(cs_ext_sales_price) as double)*100/
           cast(sum(sum(cs_ext_sales_price)) over (partition by i_class) as double), 6)
           as revenueratio
 from	catalog_sales
     ,item
     ,date_dim
 where cs_item_sk = i_item_sk
   and i_category in ('Jewelry', 'Sports', 'Books')
   and cs_sold_date_sk = d_date_sk
 and d_date between cast('2001-01-12' as date)
 				and cast('2001-02-11' as date)
 group by i_item_id
         ,i_item_desc
         ,i_category
         ,i_class
         ,i_current_price
 order by i_category
         ,i_class
         ,i_item_id
         ,i_item_desc
         ,revenueratio
limit 100
"""

# -- q21 (q21.sql: inventory before/after the price-change date; endpoints
#    precomputed ('1998-03-09'/'1998-05-08'); SUM(int) pinned to BIGINT) -----
Q21_BODY = """
select  w_warehouse_name
       ,i_item_id
       ,cast(inv_before as bigint) inv_before
       ,cast(inv_after as bigint) inv_after
 from(select w_warehouse_name
            ,i_item_id
            ,sum(case when (cast(d_date as date) < cast ('1998-04-08' as date))
	                then inv_quantity_on_hand
                      else 0 end) as inv_before
            ,sum(case when (cast(d_date as date) >= cast ('1998-04-08' as date))
                      then inv_quantity_on_hand
                      else 0 end) as inv_after
   from inventory
       ,warehouse
       ,item
       ,date_dim
   where i_current_price between 0.99 and 1.49
     and i_item_sk          = inv_item_sk
     and inv_warehouse_sk   = w_warehouse_sk
     and inv_date_sk    = d_date_sk
     and d_date between cast ('1998-03-09' as date)
                    and cast ('1998-05-08' as date)
   group by w_warehouse_name, i_item_id) x
 where (case when inv_before > 0
             then inv_after / inv_before
             else null
             end) between 2.0/3.0 and 3.0/2.0
 order by w_warehouse_name
         ,i_item_id
 limit 100
"""

# -- q22 (q22.sql: average stock per item hierarchy rollup; avg through
#    sum/count (qoh is nullable), NULLS FIRST pins on the truncating sort) ---
Q22_BODY = """
select  i_product_name
             ,i_brand
             ,i_class
             ,i_category
             ,round(cast(sum(inv_quantity_on_hand) as double)
                    /count(inv_quantity_on_hand),6) qoh
       from inventory
           ,date_dim
           ,item
       where inv_date_sk=d_date_sk
              and inv_item_sk=i_item_sk
              and d_month_seq between 1212 and 1212 + 11
       group by rollup(i_product_name
                       ,i_brand
                       ,i_class
                       ,i_category)
order by qoh nulls first, i_product_name nulls first, i_brand nulls first,
         i_class nulls first, i_category nulls first
limit 100
"""

# -- q23 (q23.sql, FIRST variant: January catalog+web spend of best store
#    customers on frequently-sold items) -------------------------------------
Q23_BODY = """
with frequent_ss_items as
 (select substr(i_item_desc,1,30) itemdesc,i_item_sk item_sk,d_date solddate,count(*) cnt
  from store_sales
      ,date_dim
      ,item
  where ss_sold_date_sk = d_date_sk
    and ss_item_sk = i_item_sk
    and d_year in (1999,1999+1,1999+2,1999+3)
  group by substr(i_item_desc,1,30),i_item_sk,d_date
  having count(*) >4),
 max_store_sales as
 (select max(csales) tpcds_cmax
  from (select c_customer_sk,sum(ss_quantity*ss_sales_price) csales
        from store_sales
            ,customer
            ,date_dim
        where ss_customer_sk = c_customer_sk
         and ss_sold_date_sk = d_date_sk
         and d_year in (1999,1999+1,1999+2,1999+3)
        group by c_customer_sk)),
 best_ss_customer as
 (select c_customer_sk,sum(ss_quantity*ss_sales_price) ssales
  from store_sales
      ,customer
  where ss_customer_sk = c_customer_sk
  group by c_customer_sk
  having sum(ss_quantity*ss_sales_price) > (95/100.0) * (select
  *
from
 max_store_sales))
  select  cast(sum(sales) as double) total_sales
 from (select cs_quantity*cs_list_price sales
       from catalog_sales
           ,date_dim
       where d_year = 1999
         and d_moy = 1
         and cs_sold_date_sk = d_date_sk
         and cs_item_sk in (select item_sk from frequent_ss_items)
         and cs_bill_customer_sk in (select c_customer_sk from best_ss_customer)
      union all
      select ws_quantity*ws_list_price sales
       from web_sales
           ,date_dim
       where d_year = 1999
         and d_moy = 1
         and ws_sold_date_sk = d_date_sk
         and ws_item_sk in (select item_sk from frequent_ss_items)
         and ws_bill_customer_sk in (select c_customer_sk from best_ss_customer))
 limit 100
"""

# -- q24 (q24.sql, FIRST variant: returned-orchid spend per customer/store
#    above 5% of the cross-store average) ------------------------------------
Q24_BODY = """
with ssales as
(select c_last_name
      ,c_first_name
      ,s_store_name
      ,ca_state
      ,s_state
      ,i_color
      ,i_current_price
      ,i_manager_id
      ,i_units
      ,i_size
      ,sum(ss_sales_price) netpaid
from store_sales
    ,store_returns
    ,store
    ,item
    ,customer
    ,customer_address
where ss_ticket_number = sr_ticket_number
  and ss_item_sk = sr_item_sk
  and ss_customer_sk = c_customer_sk
  and ss_item_sk = i_item_sk
  and ss_store_sk = s_store_sk
  and c_current_addr_sk = ca_address_sk
  and c_birth_country <> upper(ca_country)
  and s_zip = ca_zip
and s_market_id=7
group by c_last_name
        ,c_first_name
        ,s_store_name
        ,ca_state
        ,s_state
        ,i_color
        ,i_current_price
        ,i_manager_id
        ,i_units
        ,i_size)
select c_last_name
      ,c_first_name
      ,s_store_name
      ,cast(sum(netpaid) as double) paid
from ssales
where i_color = 'orchid'
group by c_last_name
        ,c_first_name
        ,s_store_name
having sum(netpaid) > (select 0.05*avg(netpaid)
                                 from ssales)
order by c_last_name
        ,c_first_name
        ,s_store_name
"""

# -- q25 (q25.sql: buy->return->catalog-rebuy profit chain) ------------------
Q25_BODY = """
select
 i_item_id
 ,i_item_desc
 ,s_store_id
 ,s_store_name
 ,cast(sum(ss_net_profit) as double) as store_sales_profit
 ,cast(sum(sr_net_loss) as double) as store_returns_loss
 ,cast(sum(cs_net_profit) as double) as catalog_sales_profit
 from
 store_sales
 ,store_returns
 ,catalog_sales
 ,date_dim d1
 ,date_dim d2
 ,date_dim d3
 ,store
 ,item
 where
 d1.d_moy = 4
 and d1.d_year = 2000
 and d1.d_date_sk = ss_sold_date_sk
 and i_item_sk = ss_item_sk
 and s_store_sk = ss_store_sk
 and ss_customer_sk = sr_customer_sk
 and ss_item_sk = sr_item_sk
 and ss_ticket_number = sr_ticket_number
 and sr_returned_date_sk = d2.d_date_sk
 and d2.d_moy               between 4 and  10
 and d2.d_year              = 2000
 and sr_customer_sk = cs_bill_customer_sk
 and sr_item_sk = cs_item_sk
 and cs_sold_date_sk = d3.d_date_sk
 and d3.d_moy               between 4 and  10
 and d3.d_year              = 2000
 group by
 i_item_id
 ,i_item_desc
 ,s_store_id
 ,s_store_name
 order by
 i_item_id
 ,i_item_desc
 ,s_store_id
 ,s_store_name
 limit 100
"""

# -- q26 (q26.sql: catalog demographics averages, sum/count form) ------------
Q26_BODY = """
select  i_item_id,
        round(cast(sum(cast(cs_quantity as decimal(18,2))) as double)/count(*),6) agg1,
        round(cast(sum(cs_list_price) as double)/count(*),6) agg2,
        round(cast(sum(cs_coupon_amt) as double)/count(*),6) agg3,
        round(cast(sum(cs_sales_price) as double)/count(*),6) agg4
 from catalog_sales, customer_demographics, date_dim, item, promotion
 where cs_sold_date_sk = d_date_sk and
       cs_item_sk = i_item_sk and
       cs_bill_cdemo_sk = cd_demo_sk and
       cs_promo_sk = p_promo_sk and
       cd_gender = 'F' and
       cd_marital_status = 'W' and
       cd_education_status = 'Primary' and
       (p_channel_email = 'N' or p_channel_event = 'N') and
       d_year = 1998
 group by i_item_id
 order by i_item_id
 limit 100
"""

# -- q29 (q29.sql: buy->return->rebuy quantity chain; SUM(int) -> BIGINT) ----
Q29_BODY = """
select
     i_item_id
    ,i_item_desc
    ,s_store_id
    ,s_store_name
    ,cast(sum(ss_quantity)        as bigint) as store_sales_quantity
    ,cast(sum(sr_return_quantity) as bigint) as store_returns_quantity
    ,cast(sum(cs_quantity)        as bigint) as catalog_sales_quantity
 from
    store_sales
   ,store_returns
   ,catalog_sales
   ,date_dim             d1
   ,date_dim             d2
   ,date_dim             d3
   ,store
   ,item
 where
     d1.d_moy               = 4
 and d1.d_year              = 1999
 and d1.d_date_sk           = ss_sold_date_sk
 and i_item_sk              = ss_item_sk
 and s_store_sk             = ss_store_sk
 and ss_customer_sk         = sr_customer_sk
 and ss_item_sk             = sr_item_sk
 and ss_ticket_number       = sr_ticket_number
 and sr_returned_date_sk    = d2.d_date_sk
 and d2.d_moy               between 4 and  4 + 3
 and d2.d_year              = 1999
 and sr_customer_sk         = cs_bill_customer_sk
 and sr_item_sk             = cs_item_sk
 and cs_sold_date_sk        = d3.d_date_sk
 and d3.d_year              in (1999,1999+1,1999+2)
 group by
    i_item_id
   ,i_item_desc
   ,s_store_id
   ,s_store_name
 order by
    i_item_id
   ,i_item_desc
   ,s_store_id
   ,s_store_name
 limit 100
"""

# -- q30 (q30.sql: web-return outliers by state via correlated avg) ----------
Q30_BODY = """
with customer_total_return as
 (select wr_returning_customer_sk as ctr_customer_sk
        ,ca_state as ctr_state,
 	sum(wr_return_amt) as ctr_total_return
 from web_returns
     ,date_dim
     ,customer_address
 where wr_returned_date_sk = d_date_sk
   and d_year =2002
   and wr_returning_addr_sk = ca_address_sk
 group by wr_returning_customer_sk
         ,ca_state)
  select  c_customer_id,c_salutation,c_first_name,c_last_name,c_preferred_cust_flag
       ,c_birth_day,c_birth_month,c_birth_year,c_birth_country,c_login,c_email_address
       ,c_last_review_date_sk,cast(ctr_total_return as double) ctr_total_return
 from customer_total_return ctr1
     ,customer_address
     ,customer
 where ctr1.ctr_total_return > (select avg(ctr_total_return)*1.2
 			  from customer_total_return ctr2
                  	  where ctr1.ctr_state = ctr2.ctr_state)
       and ca_address_sk = c_current_addr_sk
       and ca_state = 'IL'
       and ctr1.ctr_customer_sk = c_customer_sk
 order by c_customer_id,c_salutation,c_first_name,c_last_name,c_preferred_cust_flag
                  ,c_birth_day,c_birth_month,c_birth_year,c_birth_country,c_login,c_email_address
                  ,c_last_review_date_sk,ctr_total_return
limit 100
"""

_BODIES = {
    "tpcds_real_q18": Q18_BODY,
    "tpcds_real_q20": Q20_BODY,
    "tpcds_real_q21": Q21_BODY,
    "tpcds_real_q22": Q22_BODY,
    "tpcds_real_q23": Q23_BODY,
    "tpcds_real_q24": Q24_BODY,
    "tpcds_real_q25": Q25_BODY,
    "tpcds_real_q26": Q26_BODY,
    "tpcds_real_q29": Q29_BODY,
    "tpcds_real_q30": Q30_BODY,
}

QUERIES: dict[str, QuerySpec] = {
    name: QuerySpec(_spark_runner(body), _oracle(body))
    for name, body in _BODIES.items()
}
