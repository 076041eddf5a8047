SELECT ROUND(AVG(l_quantity), 6) AS mean_qty,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
           ROUND(MIN(l_quantity), 6) AS min_qty,
           ROUND(MAX(l_quantity), 6) AS max_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
