WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents),
    c AS (SELECT tok, COUNT(*)::BIGINT AS cnt FROM tok GROUP BY tok),
    tot AS (SELECT SUM(cnt)::DOUBLE AS total FROM c),
    top AS (
      SELECT tok, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank,
             SUM(cnt) OVER (ORDER BY cnt DESC, tok
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_cnt
      FROM c)
    SELECT rank::BIGINT AS rank, tok, cnt,
           ROUND(cum_cnt / total, 6) AS cum_frac
    FROM top, tot WHERE rank <= 100 ORDER BY rank
