"""Verbatim TPC-DS queries over the real star schema, tranche 3 (q53-q89).

Same fidelity contract as tpcds_real.py: ONE SQL body per query, byte-
identical on both engines (reference: benchmarks/queries-tpcds/q{53,59,
61,63,65,67,68,70,73,79,89}.sql, the suite its CI runs at SF1 —
.github/workflows/tpcds.yml:55-74), over the committed deterministic star
fixture v3 (tools/gen_tpcds_star.py).

Deviations, each forced by cross-engine rules (docs/TYPE_COMPAT.md):
- aggregates aliased; decimal sums pinned via CAST(... AS DOUBLE); AVG
  windows over decimal sums rounded through double (Spark keeps DECIMAL,
  DuckDB returns DOUBLE); decimal/decimal ratios (q59, q61) rewritten as
  double division ROUND(...,6) — the engines' decimal division scale
  rules differ;
- q67's truncating ORDER BY carries explicit NULLS FIRST on its eight
  rollup-nullable keys (Spark ASC defaults NULLS FIRST, DuckDB NULLS
  LAST — with LIMIT 100 the defaults select different rows).
"""

from __future__ import annotations

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.tpcds_real import _oracle, _spark_runner

# -- q53 (q53.sql: quarterly sales vs manufact average via windowed avg) -----
Q53_BODY = """
select  * from
(select i_manufact_id,
cast(sum(ss_sales_price) as double) sum_sales,
round(cast(avg(sum(ss_sales_price)) over (partition by i_manufact_id) as double), 6) avg_quarterly_sales
from item, store_sales, date_dim, store
where ss_item_sk = i_item_sk and
ss_sold_date_sk = d_date_sk and
ss_store_sk = s_store_sk and
d_month_seq in (1212,1212+1,1212+2,1212+3,1212+4,1212+5,1212+6,1212+7,1212+8,1212+9,1212+10,1212+11) and
((i_category in ('Books','Children','Electronics') and
i_class in ('personal','portable','reference','self-help') and
i_brand in ('scholaramalgamalg #14','scholaramalgamalg #7',
		'exportiunivamalg #9','scholaramalgamalg #9'))
or(i_category in ('Women','Music','Men') and
i_class in ('accessories','classical','fragrances','pants') and
i_brand in ('amalgimporto #1','edu packscholar #1','exportiimporto #1',
		'importoamalg #1')))
group by i_manufact_id, d_qoy ) tmp1
where case when avg_quarterly_sales > 0
	then abs (sum_sales - avg_quarterly_sales)/ avg_quarterly_sales
	else null end > 0.1
order by avg_quarterly_sales,
	 sum_sales,
	 i_manufact_id
limit 100
"""

# -- q59 (q59.sql: week-over-week store sales ratios one year apart; the
#    wss CTE is shared; day ratios pinned through double division) -----------
Q59_BODY = """
with wss as
 (select d_week_seq,
        ss_store_sk,
        sum(case when (d_day_name='Sunday') then ss_sales_price else null end) sun_sales,
        sum(case when (d_day_name='Monday') then ss_sales_price else null end) mon_sales,
        sum(case when (d_day_name='Tuesday') then ss_sales_price else  null end) tue_sales,
        sum(case when (d_day_name='Wednesday') then ss_sales_price else null end) wed_sales,
        sum(case when (d_day_name='Thursday') then ss_sales_price else null end) thu_sales,
        sum(case when (d_day_name='Friday') then ss_sales_price else null end) fri_sales,
        sum(case when (d_day_name='Saturday') then ss_sales_price else null end) sat_sales
 from store_sales,date_dim
 where d_date_sk = ss_sold_date_sk
 group by d_week_seq,ss_store_sk
 )
  select  s_store_name1,s_store_id1,d_week_seq1
       ,round(cast(sun_sales1 as double)/cast(sun_sales2 as double), 6) sun_ratio
       ,round(cast(mon_sales1 as double)/cast(mon_sales2 as double), 6) mon_ratio
       ,round(cast(tue_sales1 as double)/cast(tue_sales2 as double), 6) tue_ratio
       ,round(cast(wed_sales1 as double)/cast(wed_sales2 as double), 6) wed_ratio
       ,round(cast(thu_sales1 as double)/cast(thu_sales2 as double), 6) thu_ratio
       ,round(cast(fri_sales1 as double)/cast(fri_sales2 as double), 6) fri_ratio
       ,round(cast(sat_sales1 as double)/cast(sat_sales2 as double), 6) sat_ratio
 from
 (select s_store_name s_store_name1,wss.d_week_seq d_week_seq1
        ,s_store_id s_store_id1,sun_sales sun_sales1
        ,mon_sales mon_sales1,tue_sales tue_sales1
        ,wed_sales wed_sales1,thu_sales thu_sales1
        ,fri_sales fri_sales1,sat_sales sat_sales1
  from wss,store,date_dim d
  where d.d_week_seq = wss.d_week_seq and
        ss_store_sk = s_store_sk and
        d_month_seq between 1185 and 1185 + 11) y,
 (select s_store_name s_store_name2,wss.d_week_seq d_week_seq2
        ,s_store_id s_store_id2,sun_sales sun_sales2
        ,mon_sales mon_sales2,tue_sales tue_sales2
        ,wed_sales wed_sales2,thu_sales thu_sales2
        ,fri_sales fri_sales2,sat_sales sat_sales2
  from wss,store,date_dim d
  where d.d_week_seq = wss.d_week_seq and
        ss_store_sk = s_store_sk and
        d_month_seq between 1185+ 12 and 1185 + 23) x
 where s_store_id1=s_store_id2
   and d_week_seq1=d_week_seq2-52
 order by s_store_name1,s_store_id1,d_week_seq1
limit 100
"""

# -- q61 (q61.sql: promoted-sales share — two 1-row scalar blocks crossed;
#    the decimal ratio rewritten through double, outputs aliased) ------------
Q61_BODY = """
select  cast(promotions as double) promotions
       ,cast(total as double) total
       ,round(cast(promotions as double)/cast(total as double)*100, 6) promo_pct
from
  (select sum(ss_ext_sales_price) promotions
   from  store_sales
        ,store
        ,promotion
        ,date_dim
        ,customer
        ,customer_address
        ,item
   where ss_sold_date_sk = d_date_sk
   and   ss_store_sk = s_store_sk
   and   ss_promo_sk = p_promo_sk
   and   ss_customer_sk= c_customer_sk
   and   ca_address_sk = c_current_addr_sk
   and   ss_item_sk = i_item_sk
   and   ca_gmt_offset = -7
   and   i_category = 'Books'
   and   (p_channel_dmail = 'Y' or p_channel_email = 'Y' or p_channel_tv = 'Y')
   and   s_gmt_offset = -7
   and   d_year = 1999
   and   d_moy  = 11) promotional_sales,
  (select sum(ss_ext_sales_price) total
   from  store_sales
        ,store
        ,date_dim
        ,customer
        ,customer_address
        ,item
   where ss_sold_date_sk = d_date_sk
   and   ss_store_sk = s_store_sk
   and   ss_customer_sk= c_customer_sk
   and   ca_address_sk = c_current_addr_sk
   and   ss_item_sk = i_item_sk
   and   ca_gmt_offset = -7
   and   i_category = 'Books'
   and   s_gmt_offset = -7
   and   d_year = 1999
   and   d_moy  = 11) all_sales
order by promotions, total
limit 100
"""

# -- q63 (q63.sql: monthly sales vs manager average via windowed avg) --------
Q63_BODY = """
select  *
from (select i_manager_id
             ,cast(sum(ss_sales_price) as double) sum_sales
             ,round(cast(avg(sum(ss_sales_price)) over (partition by i_manager_id) as double), 6) avg_monthly_sales
      from item
          ,store_sales
          ,date_dim
          ,store
      where ss_item_sk = i_item_sk
        and ss_sold_date_sk = d_date_sk
        and ss_store_sk = s_store_sk
        and d_month_seq in (1212,1212+1,1212+2,1212+3,1212+4,1212+5,1212+6,1212+7,1212+8,1212+9,1212+10,1212+11)
        and ((    i_category in ('Books','Children','Electronics')
              and i_class in ('personal','portable','reference','self-help')
              and i_brand in ('scholaramalgamalg #14','scholaramalgamalg #7',
		                  'exportiunivamalg #9','scholaramalgamalg #9'))
           or(    i_category in ('Women','Music','Men')
              and i_class in ('accessories','classical','fragrances','pants')
              and i_brand in ('amalgimporto #1','edu packscholar #1','exportiimporto #1',
		                 'importoamalg #1')))
group by i_manager_id, d_moy) tmp1
where case when avg_monthly_sales > 0 then abs (sum_sales - avg_monthly_sales) / avg_monthly_sales else null end > 0.1
order by i_manager_id
        ,avg_monthly_sales
        ,sum_sales
limit 100
"""

# -- q65 (q65.sql: under-performing (store,item) revenue at <=10% of the
#    store average; the avg threshold is internal-only, revenue pinned) ------
Q65_BODY = """
select
	s_store_name,
	i_item_desc,
	cast(sc.revenue as double) revenue,
	cast(i_current_price as double) as i_current_price,
	cast(i_wholesale_cost as double) as i_wholesale_cost,
	i_brand
 from store, item,
     (select ss_store_sk, avg(revenue) as ave
 	from
 	    (select  ss_store_sk, ss_item_sk,
 		     sum(ss_sales_price) as revenue
 		from store_sales, date_dim
 		where ss_sold_date_sk = d_date_sk and d_month_seq between 1212 and 1212+11
 		group by ss_store_sk, ss_item_sk) sa
 	group by ss_store_sk) sb,
     (select  ss_store_sk, ss_item_sk, sum(ss_sales_price) as revenue
 	from store_sales, date_dim
 	where ss_sold_date_sk = d_date_sk and d_month_seq between 1212 and 1212+11
 	group by ss_store_sk, ss_item_sk) sc
 where sb.ss_store_sk = sc.ss_store_sk and
       sc.revenue <= 0.1 * sb.ave and
       s_store_sk = sc.ss_store_sk and
       i_item_sk = sc.ss_item_sk
 order by s_store_name, i_item_desc
limit 100
"""

# -- q67 (q67.sql: 8-level ROLLUP + top-100 rank per category; sumsales
#    pinned to double; truncating ORDER BY pins NULLS FIRST on the eight
#    rollup-nullable keys — see module docstring) ----------------------------
Q67_BODY = """
select  *
from (select i_category
            ,i_class
            ,i_brand
            ,i_product_name
            ,d_year
            ,d_qoy
            ,d_moy
            ,s_store_id
            ,cast(sumsales as double) sumsales
            ,rank() over (partition by i_category order by sumsales desc) rk
      from (select i_category
                  ,i_class
                  ,i_brand
                  ,i_product_name
                  ,d_year
                  ,d_qoy
                  ,d_moy
                  ,s_store_id
                  ,sum(coalesce(ss_sales_price*ss_quantity,0)) sumsales
            from store_sales
                ,date_dim
                ,store
                ,item
       where  ss_sold_date_sk=d_date_sk
          and ss_item_sk=i_item_sk
          and ss_store_sk = s_store_sk
          and d_month_seq between 1212 and 1212+11
       group by  rollup(i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy,s_store_id))dw1) dw2
where rk <= 100
order by i_category nulls first
        ,i_class nulls first
        ,i_brand nulls first
        ,i_product_name nulls first
        ,d_year nulls first
        ,d_qoy nulls first
        ,d_moy nulls first
        ,s_store_id nulls first
        ,sumsales
        ,rk
limit 100
"""

# -- q68 (q68.sql: basket extended sums joined to customer geography) --------
Q68_BODY = """
select  c_last_name
       ,c_first_name
       ,ca_city
       ,bought_city
       ,ss_ticket_number
       ,extended_price
       ,extended_tax
       ,list_price
 from (select ss_ticket_number
             ,ss_customer_sk
             ,ca_city bought_city
             ,cast(sum(ss_ext_sales_price) as double) extended_price
             ,cast(sum(ss_ext_list_price) as double) list_price
             ,cast(sum(ss_ext_tax) as double) extended_tax
       from store_sales
           ,date_dim
           ,store
           ,household_demographics
           ,customer_address
       where store_sales.ss_sold_date_sk = date_dim.d_date_sk
         and store_sales.ss_store_sk = store.s_store_sk
        and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        and store_sales.ss_addr_sk = customer_address.ca_address_sk
        and date_dim.d_dom between 1 and 2
        and (household_demographics.hd_dep_count = 6 or
             household_demographics.hd_vehicle_count= 3)
        and date_dim.d_year in (1999,1999+1,1999+2)
        and store.s_city in ('Oakland','Riverside')
       group by ss_ticket_number
               ,ss_customer_sk
               ,ss_addr_sk,ca_city) dn
      ,customer
      ,customer_address current_addr
 where ss_customer_sk = c_customer_sk
   and customer.c_current_addr_sk = current_addr.ca_address_sk
   and current_addr.ca_city <> bought_city
 order by c_last_name
         ,ss_ticket_number
 limit 100
"""

# -- q70 (q70.sql: state/county ROLLUP restricted to the top-5 profit
#    states; <= ~60 result rows so the ORDER BY never truncates) -------------
Q70_BODY = """
select
    cast(sum(ss_net_profit) as double) as total_sum
   ,s_state
   ,s_county
   ,grouping(s_state)+grouping(s_county) as lochierarchy
   ,rank() over (
 	partition by grouping(s_state)+grouping(s_county),
 	case when grouping(s_county) = 0 then s_state end
 	order by sum(ss_net_profit) desc) as rank_within_parent
 from
    store_sales
   ,date_dim       d1
   ,store
 where
    d1.d_month_seq between 1212 and 1212+11
 and d1.d_date_sk = ss_sold_date_sk
 and s_store_sk  = ss_store_sk
 and s_state in
             ( select s_state
               from  (select s_state as s_state,
 			    rank() over ( partition by s_state order by sum(ss_net_profit) desc) as ranking
                      from   store_sales, store, date_dim
                      where  d_month_seq between 1212 and 1212+11
 			    and d_date_sk = ss_sold_date_sk
 			    and s_store_sk  = ss_store_sk
                      group by s_state
                     ) tmp1
               where ranking <= 5
             )
 group by rollup(s_state,s_county)
 order by
   lochierarchy desc
  ,case when lochierarchy = 0 then s_state end
  ,rank_within_parent
 limit 100
"""

# -- q73 (q73.sql verbatim: small-basket frequent shoppers; no money
#    columns and no LIMIT, so zero deviations beyond none) -------------------
Q73_BODY = """
select c_last_name
       ,c_first_name
       ,c_salutation
       ,c_preferred_cust_flag
       ,ss_ticket_number
       ,cnt from
   (select ss_ticket_number
          ,ss_customer_sk
          ,count(*) cnt
    from store_sales,date_dim,store,household_demographics
    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_store_sk = store.s_store_sk
    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    and date_dim.d_dom between 1 and 2
    and (household_demographics.hd_buy_potential = '>10000' or
         household_demographics.hd_buy_potential = '5001-10000')
    and household_demographics.hd_vehicle_count > 0
    and case when household_demographics.hd_vehicle_count > 0 then
             household_demographics.hd_dep_count/ household_demographics.hd_vehicle_count else null end > 1
    and date_dim.d_year in (1999,1999+1,1999+2)
    and store.s_county in ('Daviess County','Franklin Parish','Barrow County','Luce County')
    group by ss_ticket_number,ss_customer_sk) dj,customer
    where ss_customer_sk = c_customer_sk
      and cnt between 1 and 5
    order by cnt desc, c_last_name asc
"""

# -- q79 (q79.sql: Monday big-store baskets; substr output aliased, amt and
#    profit pinned to double) ------------------------------------------------
Q79_BODY = """
select
  c_last_name,c_first_name,substr(s_city,1,30) s_city_30,ss_ticket_number,amt,profit
  from
   (select ss_ticket_number
          ,ss_customer_sk
          ,store.s_city
          ,cast(sum(ss_coupon_amt) as double) amt
          ,cast(sum(ss_net_profit) as double) profit
    from store_sales,date_dim,store,household_demographics
    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_store_sk = store.s_store_sk
    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    and (household_demographics.hd_dep_count = 8 or household_demographics.hd_vehicle_count > 0)
    and date_dim.d_dow = 1
    and date_dim.d_year in (1998,1998+1,1998+2)
    and store.s_number_employees between 200 and 295
    group by ss_ticket_number,ss_customer_sk,ss_addr_sk,store.s_city) ms,customer
    where ss_customer_sk = c_customer_sk
 order by c_last_name,c_first_name,substr(s_city,1,30), profit
limit 100
"""

# -- q89 (q89.sql: monthly sales vs brand/store average via windowed avg) ----
Q89_BODY = """
select  *
from(
select i_category, i_class, i_brand,
       s_store_name, s_company_name,
       d_moy,
       cast(sum(ss_sales_price) as double) sum_sales,
       round(cast(avg(sum(ss_sales_price)) over
         (partition by i_category, i_brand, s_store_name, s_company_name) as double), 6)
         avg_monthly_sales
from item, store_sales, date_dim, store
where ss_item_sk = i_item_sk and
      ss_sold_date_sk = d_date_sk and
      ss_store_sk = s_store_sk and
      d_year in (2000) and
        ((i_category in ('Home','Books','Electronics') and
          i_class in ('wallpaper','parenting','musical')
         )
      or (i_category in ('Shoes','Jewelry','Men') and
          i_class in ('womens','birdal','pants')
        ))
group by i_category, i_class, i_brand,
         s_store_name, s_company_name, d_moy) tmp1
where case when (avg_monthly_sales <> 0) then (abs(sum_sales - avg_monthly_sales) / avg_monthly_sales) else null end > 0.1
order by sum_sales - avg_monthly_sales, s_store_name
limit 100
"""

_BODIES = {
    "tpcds_real_q53": Q53_BODY,
    "tpcds_real_q59": Q59_BODY,
    "tpcds_real_q61": Q61_BODY,
    "tpcds_real_q63": Q63_BODY,
    "tpcds_real_q65": Q65_BODY,
    "tpcds_real_q67": Q67_BODY,
    "tpcds_real_q68": Q68_BODY,
    "tpcds_real_q70": Q70_BODY,
    "tpcds_real_q73": Q73_BODY,
    "tpcds_real_q79": Q79_BODY,
    "tpcds_real_q89": Q89_BODY,
}

QUERIES: dict[str, QuerySpec] = {
    name: QuerySpec(_spark_runner(body), _oracle(body))
    for name, body in _BODIES.items()
}
