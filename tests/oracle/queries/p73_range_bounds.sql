SELECT ROUND(unnest([0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]), 6)
             AS q,
           unnest(percentile_disc([0.125, 0.25, 0.375, 0.5, 0.625, 0.75,
                                   0.875])
                  WITHIN GROUP (ORDER BY o_totalprice)) AS bound
    FROM orders ORDER BY q
