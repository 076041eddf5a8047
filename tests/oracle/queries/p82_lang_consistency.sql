WITH h AS (SELECT doc_id, source, lang,
                      len(list_filter(string_split_regex(trim(text), '\s+'), x -> list_contains(['der','die','und','das','ist'], x)))::BIGINT AS h_de, len(list_filter(string_split_regex(trim(text), '\s+'), x -> list_contains(['the','and','of','to','a'], x)))::BIGINT AS h_en, len(list_filter(string_split_regex(trim(text), '\s+'), x -> list_contains(['el','la','los','que','de'], x)))::BIGINT AS h_es, len(list_filter(string_split_regex(trim(text), '\s+'), x -> list_contains(['le','la','et','les','des'], x)))::BIGINT AS h_fr, len(list_filter(string_split_regex(trim(text), '\s+'), x -> list_contains(['de','le','shi','bu','wo'], x)))::BIGINT AS h_zh FROM documents),
    pred AS (
      SELECT source, lang,
             CASE
               WHEN h_de = 0 AND h_en = 0 AND h_es = 0 AND h_fr = 0
                    AND h_zh = 0 THEN 'und'
               WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr
                    AND h_de >= h_zh THEN 'de'
               WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
               WHEN h_es >= h_fr AND h_es >= h_zh THEN 'es'
               WHEN h_fr >= h_zh THEN 'fr'
               ELSE 'zh' END AS lang_pred
      FROM h)
    SELECT source, COUNT(*)::BIGINT AS n,
           SUM(CASE WHEN lang_pred = lang THEN 1 ELSE 0 END)::BIGINT
             AS n_match,
           ROUND(AVG(CASE WHEN lang_pred = lang THEN 1.0 ELSE 0.0 END), 6)
             AS match_rate
    FROM pred GROUP BY source ORDER BY source
