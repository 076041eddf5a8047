WITH baskets AS (
      SELECT DISTINCT l_orderkey AS k, (l_partkey % 50) AS item
      FROM lineitem),
    n AS (SELECT COUNT(DISTINCT k)::DOUBLE AS n_orders FROM baskets),
    ic AS (SELECT item, COUNT(*)::DOUBLE AS c_item
           FROM baskets GROUP BY item),
    pc AS (
      SELECT a.item AS x, b.item AS y, COUNT(*)::BIGINT AS c_pair
      FROM baskets a JOIN baskets b ON a.k = b.k AND a.item < b.item
      GROUP BY a.item, b.item)
    SELECT x, y, c_pair,
           ROUND(c_pair / n_orders, 6) AS support,
           ROUND(c_pair / cx.c_item, 6) AS conf_xy,
           ROUND(c_pair * n_orders / (cx.c_item * cy.c_item), 6) AS lift
    FROM pc JOIN ic cx ON pc.x = cx.item
            JOIN ic cy ON pc.y = cy.item, n
    ORDER BY support DESC, x, y LIMIT 20
