WITH r AS (
      SELECT (o_custkey % 10)::BIGINT AS cust_bucket, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey % 10
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    SELECT cust_bucket, o_orderkey, ROUND(o_totalprice, 2) AS price
    FROM r WHERE rn <= 3
    ORDER BY cust_bucket, o_orderkey
