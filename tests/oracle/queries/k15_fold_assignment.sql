-- DuckDB oracle for k15_fold_assignment (frozen; see __spark_entry__.py)
SELECT CAST(MOD(MOD(o_orderkey * 2654435761, 4294967296), 10) AS BIGINT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY MOD(MOD(o_orderkey * 2654435761, 4294967296), 10)
    ORDER BY fold
