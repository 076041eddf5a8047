WITH ev AS (
      SELECT user_id, weekofyear(ts) AS week FROM events),
    first AS (
      SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id)
    SELECT cohort_week, (week - cohort_week)::BIGINT AS week_offset,
           COUNT(DISTINCT ev.user_id)::BIGINT AS active_users
    FROM ev JOIN first ON ev.user_id = first.user_id
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
