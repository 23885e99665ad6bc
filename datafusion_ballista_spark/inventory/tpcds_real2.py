"""Verbatim TPC-DS queries over the real star schema, tranche 2 (q6-q48).

Same fidelity contract as tpcds_real.py: ONE SQL body per query, byte-
identical on both engines (reference: benchmarks/queries-tpcds/q{6,8,27,
28,34,36,41,43,44,46,47,48}.sql, the suite its CI runs at SF1 —
.github/workflows/tpcds.yml:55-74), over the committed deterministic star
fixture v3 (tools/gen_tpcds_star.py — basket-structured store_sales, so
the ticket-rollup queries q34/q46 return genuine multi-row baskets).

Deviations, each forced by cross-engine rules (docs/TYPE_COMPAT.md):
- aggregates aliased; decimal sums pinned via CAST(... AS DOUBLE); AVG
  over decimal rewritten to the repo-standard exact-decimal-then-double
  ``ROUND(CAST(SUM(..) AS DOUBLE)/COUNT(..), 6)`` (Spark yields DECIMAL,
  DuckDB DOUBLE otherwise); SUM(int) pinned to BIGINT (DuckDB HUGEINT);
- q27's truncating ORDER BY carries explicit NULLS FIRST on its
  rollup-nullable keys: Spark's ASC default is NULLS FIRST, DuckDB's is
  NULLS LAST, and with LIMIT 100 the default divergence would select
  different row sets from identical results.
"""

from __future__ import annotations

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.tpcds_real import _oracle, _spark_runner

# -- q6 (q6.sql verbatim: correlated category-average price subquery +
#    uncorrelated month-seq scalar; cnt/state ordering is tie-free) ----------
Q6_BODY = """
select  a.ca_state state, count(*) cnt
 from customer_address a
     ,customer c
     ,store_sales s
     ,date_dim d
     ,item i
 where       a.ca_address_sk = c.c_current_addr_sk
 	and c.c_customer_sk = s.ss_customer_sk
 	and s.ss_sold_date_sk = d.d_date_sk
 	and s.ss_item_sk = i.i_item_sk
 	and d.d_month_seq =
 	     (select distinct (d_month_seq)
 	      from date_dim
               where d_year = 2000
 	        and d_moy = 2 )
 	and i.i_current_price > 1.2 *
             (select avg(j.i_current_price)
 	     from item j
 	     where j.i_category = i.i_category)
 group by a.ca_state
 having count(*) >= 10
 order by cnt, a.ca_state
 limit 100
"""

# -- q8 (q8.sql: zip-neighborhood INTERSECT; net profit pinned to double;
#    the 400-zip literal list kept verbatim) ---------------------------------
Q8_ZIPS = """'89436','30868','65085','22977','83927','77557',
                          '58429','40697','80614','10502','32779',
                          '91137','61265','98294','17921','18427',
                          '21203','59362','87291','84093','21505',
                          '17184','10866','67898','25797','28055',
                          '18377','80332','74535','21757','29742',
                          '90885','29898','17819','40811','25990',
                          '47513','89531','91068','10391','18846',
                          '99223','82637','41368','83658','86199',
                          '81625','26696','89338','88425','32200',
                          '81427','19053','77471','36610','99823',
                          '43276','41249','48584','83550','82276',
                          '18842','78890','14090','38123','40936',
                          '34425','19850','43286','80072','79188',
                          '54191','11395','50497','84861','90733',
                          '21068','57666','37119','25004','57835',
                          '70067','62878','95806','19303','18840',
                          '19124','29785','16737','16022','49613',
                          '89977','68310','60069','98360','48649',
                          '39050','41793','25002','27413','39736',
                          '47208','16515','94808','57648','15009',
                          '80015','42961','63982','21744','71853',
                          '81087','67468','34175','64008','20261',
                          '11201','51799','48043','45645','61163',
                          '48375','36447','57042','21218','41100',
                          '89951','22745','35851','83326','61125',
                          '78298','80752','49858','52940','96976',
                          '63792','11376','53582','18717','90226',
                          '50530','94203','99447','27670','96577',
                          '57856','56372','16165','23427','54561',
                          '28806','44439','22926','30123','61451',
                          '92397','56979','92309','70873','13355',
                          '21801','46346','37562','56458','28286',
                          '47306','99555','69399','26234','47546',
                          '49661','88601','35943','39936','25632',
                          '24611','44166','56648','30379','59785',
                          '11110','14329','93815','52226','71381',
                          '13842','25612','63294','14664','21077',
                          '82626','18799','60915','81020','56447',
                          '76619','11433','13414','42548','92713',
                          '70467','30884','47484','16072','38936',
                          '13036','88376','45539','35901','19506',
                          '65690','73957','71850','49231','14276',
                          '20005','18384','76615','11635','38177',
                          '55607','41369','95447','58581','58149',
                          '91946','33790','76232','75692','95464',
                          '22246','51061','56692','53121','77209',
                          '15482','10688','14868','45907','73520',
                          '72666','25734','17959','24677','66446',
                          '94627','53535','15560','41967','69297',
                          '11929','59403','33283','52232','57350',
                          '43933','40921','36635','10827','71286',
                          '19736','80619','25251','95042','15526',
                          '36496','55854','49124','81980','35375',
                          '49157','63512','28944','14946','36503',
                          '54010','18767','23969','43905','66979',
                          '33113','21286','58471','59080','13395',
                          '79144','70373','67031','38360','26705',
                          '50906','52406','26066','73146','15884',
                          '31897','30045','61068','45550','92454',
                          '13376','14354','19770','22928','97790',
                          '50723','46081','30202','14410','20223',
                          '88500','67298','13261','14172','81410',
                          '93578','83583','46047','94167','82564',
                          '21156','15799','86709','37931','74703',
                          '83103','23054','70470','72008','49247',
                          '91911','69998','20961','70070','63197',
                          '54853','88191','91830','49521','19454',
                          '81450','89091','62378','25683','61869',
                          '51744','36580','85778','36871','48121',
                          '28810','83712','45486','67393','26935',
                          '42393','20132','55349','86057','21309',
                          '80218','10094','11357','48819','39734',
                          '40758','30432','21204','29467','30214',
                          '61024','55307','74621','11622','68908',
                          '33032','52868','99194','99900','84936',
                          '69036','99149','45013','32895','59004',
                          '32322','14933','32936','33562','72550',
                          '27385','58049','58200','16808','21360',
                          '32961','18586','79307','15492'"""

Q8_BODY = f"""
select  s_store_name
      ,cast(sum(ss_net_profit) as double) net_profit
 from store_sales
     ,date_dim
     ,store,
     (select ca_zip
     from (
      SELECT substr(ca_zip,1,5) ca_zip
      FROM customer_address
      WHERE substr(ca_zip,1,5) IN ({Q8_ZIPS})
     intersect
      select ca_zip
      from (SELECT substr(ca_zip,1,5) ca_zip,count(*) cnt
            FROM customer_address, customer
            WHERE ca_address_sk = c_current_addr_sk and
                  c_preferred_cust_flag='Y'
            group by ca_zip
            having count(*) > 10)A1)A2) V1
 where ss_store_sk = s_store_sk
  and ss_sold_date_sk = d_date_sk
  and d_qoy = 1 and d_year = 2002
  and (substr(s_zip,1,2) = substr(V1.ca_zip,1,2))
 group by s_store_name
 order by s_store_name
 limit 100
"""

# -- q27 (q27.sql: ROLLUP + grouping(); avgs in repo-standard form; the
#    truncating ORDER BY pins NULLS FIRST — see module docstring) ------------
Q27_BODY = """
select  i_item_id,
        s_state, grouping(s_state) g_state,
        round(cast(sum(cast(ss_quantity as decimal(18,2))) as double) / count(*), 6) agg1,
        round(cast(sum(ss_list_price) as double) / count(*), 6) agg2,
        round(cast(sum(ss_coupon_amt) as double) / count(*), 6) agg3,
        round(cast(sum(ss_sales_price) as double) / count(*), 6) agg4
 from store_sales, customer_demographics, date_dim, store, item
 where ss_sold_date_sk = d_date_sk and
       ss_item_sk = i_item_sk and
       ss_store_sk = s_store_sk and
       ss_cdemo_sk = cd_demo_sk and
       cd_gender = 'M' and
       cd_marital_status = 'W' and
       cd_education_status = 'College' and
       d_year = 2002 and
       s_state in ('MO','LA', 'GA', 'MI', 'SC', 'OH')
 group by rollup (i_item_id, s_state)
 order by i_item_id nulls first
         ,s_state nulls first
 limit 100
"""

# -- q28 (q28.sql: six 1-row quantity-band stat blocks cross-joined; avgs
#    rewritten sum/count — Spark DECIMAL vs DuckDB DOUBLE otherwise) ---------


def _q28_block(n: int, qlo: int, qhi: int, lp: int, cp: int, wc: int) -> str:
    return f"""
     (select round(cast(sum(ss_list_price) as double)/count(ss_list_price),6) B{n}_LP
            ,count(ss_list_price) B{n}_CNT
            ,count(distinct ss_list_price) B{n}_CNTD
      from store_sales
      where ss_quantity between {qlo} and {qhi}
        and (ss_list_price between {lp} and {lp}+10
          or ss_coupon_amt between {cp} and {cp}+1000
          or ss_wholesale_cost between {wc} and {wc}+20)) B{n}"""


Q28_BODY = (
    "select  *\nfrom"
    + ",".join(
        _q28_block(*args)
        for args in [
            (1, 0, 5, 11, 460, 14),
            (2, 6, 10, 91, 1430, 32),
            (3, 11, 15, 66, 920, 4),
            (4, 16, 20, 142, 3054, 80),
            (5, 21, 25, 135, 14180, 38),
            (6, 26, 30, 28, 2513, 42),
        ]
    )
    + "\nlimit 100\n"
)

# -- q34 (q34.sql verbatim: basket rollup, cnt 15..20 baskets; no LIMIT so
#    the order-insensitive compare needs no tie pin) -------------------------
Q34_BODY = """
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
    and (date_dim.d_dom between 1 and 3 or date_dim.d_dom between 25 and 28)
    and (household_demographics.hd_buy_potential = '>10000' or
         household_demographics.hd_buy_potential = '5001-10000')
    and household_demographics.hd_vehicle_count > 0
    and (case when household_demographics.hd_vehicle_count > 0
	then household_demographics.hd_dep_count/ household_demographics.hd_vehicle_count
	else null
	end)  > 1.2
    and date_dim.d_year in (1999,1999+1,1999+2)
    and store.s_county in ('Daviess County','Franklin Parish','Barrow County','Luce County',
                           'Fairfield County','Richland County','Ziebach County','Walker County')
    group by ss_ticket_number,ss_customer_sk) dn,customer
    where ss_customer_sk = c_customer_sk
      and cnt between 15 and 20
    order by c_last_name,c_first_name,c_salutation,c_preferred_cust_flag desc, ss_ticket_number
"""

# -- q36 (q36.sql: ROLLUP + rank over grouping(); 51 result rows < LIMIT so
#    order is non-truncating; margin ratio pinned to double) -----------------
Q36_BODY = """
select
    round(cast(sum(ss_net_profit) as double)/cast(sum(ss_ext_sales_price) as double), 6) as gross_margin
   ,i_category
   ,i_class
   ,grouping(i_category)+grouping(i_class) as lochierarchy
   ,rank() over (
 	partition by grouping(i_category)+grouping(i_class),
 	case when grouping(i_class) = 0 then i_category end
 	order by sum(ss_net_profit)/sum(ss_ext_sales_price) asc) as rank_within_parent
 from
    store_sales
   ,date_dim       d1
   ,item
   ,store
 where
    d1.d_year = 2000
 and d1.d_date_sk = ss_sold_date_sk
 and i_item_sk  = ss_item_sk
 and s_store_sk  = ss_store_sk
 and s_state in ('MO','LA','GA','MI',
                 'SC','OH','SD','AL')
 group by rollup(i_category,i_class)
 order by
   lochierarchy desc
  ,case when lochierarchy = 0 then i_category end
  ,rank_within_parent
  limit 100
"""

# -- q41 (q41.sql: item-only correlated count subquery over the literal
#    color/units/size domains; output aliased for name-matched compare) ------
Q41_BODY = """
select  distinct(i_product_name) i_product_name
 from item i1
 where i_manufact_id between 742 and 742+40
   and (select count(*) as item_cnt
        from item
        where (i_manufact = i1.i_manufact and
        ((i_category = 'Women' and
        (i_color = 'orchid' or i_color = 'papaya') and
        (i_units = 'Pound' or i_units = 'Lb') and
        (i_size = 'petite' or i_size = 'medium')
        ) or
        (i_category = 'Women' and
        (i_color = 'burlywood' or i_color = 'navy') and
        (i_units = 'Bundle' or i_units = 'Each') and
        (i_size = 'N/A' or i_size = 'extra large')
        ) or
        (i_category = 'Men' and
        (i_color = 'bisque' or i_color = 'azure') and
        (i_units = 'N/A' or i_units = 'Tsp') and
        (i_size = 'small' or i_size = 'large')
        ) or
        (i_category = 'Men' and
        (i_color = 'chocolate' or i_color = 'cornflower') and
        (i_units = 'Bunch' or i_units = 'Gross') and
        (i_size = 'petite' or i_size = 'medium')
        ))) or
       (i_manufact = i1.i_manufact and
        ((i_category = 'Women' and
        (i_color = 'salmon' or i_color = 'midnight') and
        (i_units = 'Oz' or i_units = 'Box') and
        (i_size = 'petite' or i_size = 'medium')
        ) or
        (i_category = 'Women' and
        (i_color = 'snow' or i_color = 'steel') and
        (i_units = 'Carton' or i_units = 'Tbl') and
        (i_size = 'N/A' or i_size = 'extra large')
        ) or
        (i_category = 'Men' and
        (i_color = 'purple' or i_color = 'gainsboro') and
        (i_units = 'Dram' or i_units = 'Unknown') and
        (i_size = 'small' or i_size = 'large')
        ) or
        (i_category = 'Men' and
        (i_color = 'metallic' or i_color = 'forest') and
        (i_units = 'Gram' or i_units = 'Ounce') and
        (i_size = 'petite' or i_size = 'medium')
        )))) > 0
 order by i_product_name
 limit 100
"""

# -- q43 (q43.sql: day-of-week pivot; 60 store groups < LIMIT 100) -----------
Q43_BODY = """
select  s_store_name, s_store_id,
        cast(sum(case when (d_day_name='Sunday') then ss_sales_price else null end) as double) sun_sales,
        cast(sum(case when (d_day_name='Monday') then ss_sales_price else null end) as double) mon_sales,
        cast(sum(case when (d_day_name='Tuesday') then ss_sales_price else  null end) as double) tue_sales,
        cast(sum(case when (d_day_name='Wednesday') then ss_sales_price else null end) as double) wed_sales,
        cast(sum(case when (d_day_name='Thursday') then ss_sales_price else null end) as double) thu_sales,
        cast(sum(case when (d_day_name='Friday') then ss_sales_price else null end) as double) fri_sales,
        cast(sum(case when (d_day_name='Saturday') then ss_sales_price else null end) as double) sat_sales
 from date_dim, store_sales, store
 where d_date_sk = ss_sold_date_sk and
       s_store_sk = ss_store_sk and
       s_gmt_offset = -6 and
       d_year = 1998
 group by s_store_name, s_store_id
 order by s_store_name, s_store_id,sun_sales,mon_sales,tue_sales,wed_sales,thu_sales,fri_sales,sat_sales
 limit 100
"""

# -- q44 (q44.sql verbatim: best/worst rank join at store 50; the avg
#    rank_col and its HAVING threshold are internal-only, so no cast) --------
Q44_BODY = """
select  asceding.rnk, i1.i_product_name best_performing, i2.i_product_name worst_performing
from(select *
     from (select item_sk,rank() over (order by rank_col asc) rnk
           from (select ss_item_sk item_sk,avg(ss_net_profit) rank_col
                 from store_sales ss1
                 where ss_store_sk = 50
                 group by ss_item_sk
                 having avg(ss_net_profit) > 0.9*(select avg(ss_net_profit) rank_col
                                                  from store_sales
                                                  where ss_store_sk = 50
                                                    and ss_hdemo_sk is null
                                                  group by ss_store_sk))V1)V11
     where rnk  < 11) asceding,
    (select *
     from (select item_sk,rank() over (order by rank_col desc) rnk
           from (select ss_item_sk item_sk,avg(ss_net_profit) rank_col
                 from store_sales ss1
                 where ss_store_sk = 50
                 group by ss_item_sk
                 having avg(ss_net_profit) > 0.9*(select avg(ss_net_profit) rank_col
                                                  from store_sales
                                                  where ss_store_sk = 50
                                                    and ss_hdemo_sk is null
                                                  group by ss_store_sk))V2)V21
     where rnk  < 11) descending,
item i1,
item i2
where asceding.rnk = descending.rnk
  and i1.i_item_sk=asceding.item_sk
  and i2.i_item_sk=descending.item_sk
order by asceding.rnk
limit 100
"""

# -- q46 (q46.sql: basket sums joined back to customer geography; amt and
#    profit pinned to double inside the derived table) -----------------------
Q46_BODY = """
select  c_last_name
       ,c_first_name
       ,ca_city
       ,bought_city
       ,ss_ticket_number
       ,amt,profit
 from
   (select ss_ticket_number
          ,ss_customer_sk
          ,ca_city bought_city
          ,cast(sum(ss_coupon_amt) as double) amt
          ,cast(sum(ss_net_profit) as double) profit
    from store_sales,date_dim,store,household_demographics,customer_address
    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_store_sk = store.s_store_sk
    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    and store_sales.ss_addr_sk = customer_address.ca_address_sk
    and (household_demographics.hd_dep_count = 6 or
         household_demographics.hd_vehicle_count= 3)
    and date_dim.d_dow in (6,0)
    and date_dim.d_year in (1999,1999+1,1999+2)
    and store.s_city in ('Oakland','Riverside','Union','Salem','Greenwood')
    group by ss_ticket_number,ss_customer_sk,ss_addr_sk,ca_city) dn,customer,customer_address current_addr
    where ss_customer_sk = c_customer_sk
      and customer.c_current_addr_sk = current_addr.ca_address_sk
      and current_addr.ca_city <> bought_city
  order by c_last_name
          ,c_first_name
          ,ca_city
          ,bought_city
          ,ss_ticket_number
  limit 100
"""

# -- q47 (q47.sql: year-over-year monthly sales vs category average via a
#    lag/lead self-join of the windowed CTE; money outputs pinned) -----------
Q47_BODY = """
with v1 as(
 select i_category, i_brand,
        s_store_name, s_company_name,
        d_year, d_moy,
        sum(ss_sales_price) sum_sales,
        avg(sum(ss_sales_price)) over
          (partition by i_category, i_brand,
                     s_store_name, s_company_name, d_year)
          avg_monthly_sales,
        rank() over
          (partition by i_category, i_brand,
                     s_store_name, s_company_name
           order by d_year, d_moy) rn
 from item, store_sales, date_dim, store
 where ss_item_sk = i_item_sk and
       ss_sold_date_sk = d_date_sk and
       ss_store_sk = s_store_sk and
       (
         d_year = 2000 or
         ( d_year = 2000-1 and d_moy =12) or
         ( d_year = 2000+1 and d_moy =1)
       )
 group by i_category, i_brand,
          s_store_name, s_company_name,
          d_year, d_moy),
 v2 as(
 select v1.i_category, v1.i_brand
        ,v1.d_year, v1.d_moy
        ,v1.avg_monthly_sales
        ,v1.sum_sales, v1_lag.sum_sales psum, v1_lead.sum_sales nsum
 from v1, v1 v1_lag, v1 v1_lead
 where v1.i_category = v1_lag.i_category and
       v1.i_category = v1_lead.i_category and
       v1.i_brand = v1_lag.i_brand and
       v1.i_brand = v1_lead.i_brand and
       v1.s_store_name = v1_lag.s_store_name and
       v1.s_store_name = v1_lead.s_store_name and
       v1.s_company_name = v1_lag.s_company_name and
       v1.s_company_name = v1_lead.s_company_name and
       v1.rn = v1_lag.rn + 1 and
       v1.rn = v1_lead.rn - 1)
  select i_category, i_brand, d_year, d_moy
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

# -- q48 (q48.sql: disjunctive demographic/geo bands; SUM(int) pinned to
#    BIGINT — DuckDB returns HUGEINT; single-row result) ---------------------
Q48_BODY = """
select cast(sum (ss_quantity) as bigint) sum_qty
 from store_sales, store, customer_demographics, customer_address, date_dim
 where s_store_sk = ss_store_sk
 and  ss_sold_date_sk = d_date_sk and d_year = 1998
 and
 (
  (
   cd_demo_sk = ss_cdemo_sk
   and
   cd_marital_status = 'M'
   and
   cd_education_status = '4 yr Degree'
   and
   ss_sales_price between 100.00 and 150.00
   )
 or
  (
  cd_demo_sk = ss_cdemo_sk
   and
   cd_marital_status = 'D'
   and
   cd_education_status = 'Primary'
   and
   ss_sales_price between 50.00 and 100.00
  )
 or
 (
  cd_demo_sk = ss_cdemo_sk
  and
   cd_marital_status = 'U'
   and
   cd_education_status = 'Advanced Degree'
   and
   ss_sales_price between 150.00 and 200.00
 )
 )
 and
 (
  (
  ss_addr_sk = ca_address_sk
  and
  ca_country = 'United States'
  and
  ca_state in ('KY', 'GA', 'NM')
  and ss_net_profit between 0 and 2000
  )
 or
  (ss_addr_sk = ca_address_sk
  and
  ca_country = 'United States'
  and
  ca_state in ('MT', 'OR', 'IN')
  and ss_net_profit between 150 and 3000
  )
 or
  (ss_addr_sk = ca_address_sk
  and
  ca_country = 'United States'
  and
  ca_state in ('WI', 'MO', 'WV')
  and ss_net_profit between 50 and 25000
  )
 )
"""

_BODIES = {
    "tpcds_real_q6": Q6_BODY,
    "tpcds_real_q8": Q8_BODY,
    "tpcds_real_q27": Q27_BODY,
    "tpcds_real_q28": Q28_BODY,
    "tpcds_real_q34": Q34_BODY,
    "tpcds_real_q36": Q36_BODY,
    "tpcds_real_q41": Q41_BODY,
    "tpcds_real_q43": Q43_BODY,
    "tpcds_real_q44": Q44_BODY,
    "tpcds_real_q46": Q46_BODY,
    "tpcds_real_q47": Q47_BODY,
    "tpcds_real_q48": Q48_BODY,
}

QUERIES: dict[str, QuerySpec] = {
    name: QuerySpec(_spark_runner(body), _oracle(body))
    for name, body in _BODIES.items()
}
