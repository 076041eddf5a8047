-- DuckDB oracle for k08_gaussian_primal (frozen; see __spark_entry__.py)
SELECT ROUND(0.5 * SUM(POW(l_quantity - 0.001 * l_extendedprice, 2)) / 1000000, 6) AS primal_m
    FROM lineitem
