-- DuckDB oracle for k07_poisson_primal (frozen; see __spark_entry__.py)
SELECT ROUND(-SUM(l_linenumber * (0.01 * l_quantity) - EXP(0.01 * l_quantity)) / 1000, 6) AS primal_k
    FROM lineitem
