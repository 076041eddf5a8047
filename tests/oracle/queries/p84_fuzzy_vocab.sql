WITH w AS (
      SELECT DISTINCT unnest(string_split(p_name, ' ')) AS word
      FROM part WHERE p_name IS NOT NULL),
    idx AS (
      SELECT word, variant FROM (
        SELECT word, unnest(list_append(
          list_transform(range(1, len(word) + 1),
                         i -> substr(word, 1, i - 1)
                              || substr(word, i + 1)),
          word)) AS variant
        FROM w) WHERE len(variant) > 0 OR variant = ''),
    cand AS (
      SELECT DISTINCT a.word AS word_a, b.word AS word_b
      FROM idx a JOIN idx b ON a.variant = b.variant AND a.word < b.word)
    SELECT word_a, word_b,
           levenshtein(word_a, word_b)::INT AS dist
    FROM cand WHERE levenshtein(word_a, word_b) <= 1
    ORDER BY word_a, word_b
