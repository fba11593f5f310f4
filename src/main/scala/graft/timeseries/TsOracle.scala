package graft.timeseries

/** DuckDB oracle SQL mirroring TsCore stage-for-stage. Shared WITH-chain
  * prefix; each query appends its final SELECT. DuckDB prunes unused CTEs,
  * so sharing the full prefix is free.
  */
object TsOracle {
  import TsCore._

  /** LCG uniform in [0,1) — must match TsCore.lcg exactly. */
  private def lcg(salt: Int): String =
    s"(((1103515245 * (key * 1000 + $salt) + 12345) % 2147483648)::DOUBLE / 2147483648.0)"

  val prefix: String = s"""
WITH ev AS (
  SELECT event_type AS series, CAST(floor(epoch(ts)/3600) AS BIGINT) AS hr, value FROM events
), t0 AS (SELECT min(hr) AS t0 FROM ev),
grid AS (
  SELECT series, hr - t0 AS t, count(*) AS n, floor((avg(value))*10000 + 0.5)/10000 AS v
  FROM ev, t0 GROUP BY series, hr - t0
),
tmax AS (SELECT max(t) AS tmax FROM grid),
serieslist AS (SELECT DISTINCT series FROM grid),
spine AS (
  SELECT s.series, unnest(generate_series(0, (SELECT tmax FROM tmax))) AS t
  FROM serieslist s
),
sp AS (
  SELECT spine.series, spine.t, grid.v
  FROM spine LEFT JOIN grid ON spine.series = grid.series AND spine.t = grid.t
),
filledsrc AS (
  SELECT series, t, v,
         coalesce(v, lag(v, $WeekLag) OVER (PARTITION BY series ORDER BY t)) AS v_filled
  FROM sp
),
filled AS (
  SELECT series, t, v_filled,
         CASE WHEN v IS NOT NULL THEN 'obs'
              WHEN v_filled IS NOT NULL THEN 'lag' ELSE 'missing' END AS src
  FROM filledsrc
),
day AS (
  SELECT series, CAST(floor(t / $DaySize) AS BIGINT) AS win, t % $DaySize AS pos,
         v_filled AS v
  FROM filled
),
wincomplete AS (
  SELECT series, win FROM day GROUP BY series, win HAVING count(v) = $DaySize
),
daywin AS (
  SELECT d.series, d.win, d.pos, d.v FROM day d JOIN wincomplete USING (series, win)
),
sidx AS (
  SELECT series, dense_rank() OVER (ORDER BY series) - 1 AS sidx FROM serieslist
),
keys AS (
  SELECT w.series, w.win, s.sidx * 100 + w.win AS key
  FROM (SELECT DISTINCT series, win FROM daywin) w JOIN sidx s USING (series)
),
params AS (
  SELECT series, win,
    ${lcg(1)} < $DayContamRate AS contam,
    CASE WHEN ${lcg(2)} < 0.3 THEN 1 WHEN ${lcg(2)} < 0.6 THEN 2
         WHEN ${lcg(2)} < 0.8 THEN 3 ELSE 4 END AS atype,
    ${lcg(5)} < 0.5 AS flag5,
    0.01 + ${lcg(6)} * 3.98 AS rf,
    ${lcg(7)} AS r2,
    ${lcg(3)} AS u3, ${lcg(4)} AS u4
  FROM keys
),
params2 AS (
  SELECT series, win, contam, atype, flag5, rf, r2,
    CAST(CASE WHEN atype <= 2
         THEN ${DaySize / 4} + floor(u3 * ${(DaySize - 1) / 2 - DaySize / 4})
         ELSE ${DaySize / 4} + floor(u3 * ${(DaySize - 1) * 3 / 4 - DaySize / 4}) END AS BIGINT) AS apos,
    u4 FROM params
),
params3 AS (
  SELECT series, win, contam, atype, flag5, rf, r2, apos,
    CAST(CASE WHEN atype = 1 THEN 3 + floor(u4 * (least($DaySize - apos - 1, 18) - 3))
         WHEN atype = 2 THEN 2 + floor(u4 * (least($DaySize - apos - 1, 18) - 2))
         ELSE 1 END AS BIGINT) AS alen
  FROM params2
),
aug AS (
  SELECT d.series, d.win, d.pos, d.v, p.contam, p.atype, p.flag5, p.rf, p.r2, p.apos, p.alen,
    lag(d.v) OVER (PARTITION BY d.series, d.win ORDER BY d.pos) AS vprev,
    max(CASE WHEN d.pos = p.apos THEN d.v END) OVER wa AS v_at,
    max(CASE WHEN d.pos = p.apos THEN d.cum0 - d.v END) OVER wa AS pref_at,
    max(CASE WHEN d.pos = p.apos + p.alen - 1 THEN d.cum0 END) OVER wa AS cum_end
  FROM (SELECT *, sum(v) OVER (PARTITION BY series, win ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS cum0 FROM daywin) d
  JOIN params3 p USING (series, win)
  WINDOW wa AS (PARTITION BY d.series, d.win)
),
inject AS (
  SELECT series, win, pos, floor((v)*10000 + 0.5)/10000 AS v_orig,
    floor((CASE
      WHEN NOT contam THEN v
      WHEN atype = 1 AND pos = apos THEN -pref_at
      WHEN atype = 1 AND pos > apos AND pos < apos + alen - 1 THEN 0.0
      WHEN atype = 1 AND pos = apos + alen - 1 THEN cum_end
      WHEN atype = 2 AND flag5 AND pos = apos THEN r2 * v_at
      WHEN atype = 2 AND flag5 AND pos > apos AND pos < apos + alen - 1 THEN 0.0
      WHEN atype = 2 AND flag5 AND pos = apos + alen - 1 THEN (cum_end - pref_at) - r2 * v_at
      WHEN atype = 2 AND NOT flag5 AND pos >= apos AND pos < apos + alen - 1 THEN 0.0
      WHEN atype = 2 AND NOT flag5 AND pos = apos + alen - 1 THEN cum_end - pref_at
      WHEN atype = 3 AND pos = apos THEN CASE WHEN flag5 THEN -pref_at ELSE -rf * vprev END
      WHEN atype = 4 AND pos = apos THEN CASE WHEN flag5 THEN pref_at ELSE rf * vprev END
      ELSE v END)*10000 + 0.5)/10000 AS v_anom,
    CASE WHEN contam AND ((atype <= 2 AND pos >= apos AND pos < apos + alen)
                          OR (atype >= 3 AND pos = apos)) THEN 1 ELSE 0 END AS is_anom
  FROM aug
),
bounds AS (
  SELECT series, quantile_cont(v_filled, $QLo) AS lo, quantile_cont(v_filled, $QHi) AS hi
  FROM filled WHERE v_filled IS NOT NULL GROUP BY series
),
scaled AS (
  SELECT i.series, i.win, i.pos,
         floor(((i.v_anom - b.lo) / (b.hi - b.lo))*10000 + 0.5)/10000 AS vs, i.is_anom
  FROM inject i JOIN bounds b USING (series)
),
feats AS (
  SELECT series, win, pos, vs,
    floor((stddev_samp(vs) OVER (PARTITION BY series, win, CAST(floor(pos / $FeatPatch) AS BIGINT)))*10000 + 0.5)/10000 AS pstd,
    floor((pow(${1 - Alpha}, pos) * (
      first_value(vs) OVER wseq +
      sum(CASE WHEN pos = 0 THEN 0.0 ELSE $Alpha * vs * pow(${1 - Alpha}, -pos) END)
        OVER (PARTITION BY series, win ORDER BY pos ROWS UNBOUNDED PRECEDING)))*10000 + 0.5)/10000 AS ewma,
    is_anom
  FROM scaled
  WINDOW wseq AS (PARTITION BY series, win ORDER BY pos)
),
patches AS (
  SELECT series, win, pos, is_anom,
    coalesce(lag(vs)    OVER w, 0.0) AS f0, vs   AS f1, coalesce(lead(vs)   OVER w, 0.0) AS f2,
    coalesce(lag(pstd)  OVER w, 0.0) AS f3, pstd AS f4, coalesce(lead(pstd) OVER w, 0.0) AS f5,
    coalesce(lag(ewma)  OVER w, 0.0) AS f6, ewma AS f7, coalesce(lead(ewma) OVER w, 0.0) AS f8
  FROM feats
  WINDOW w AS (PARTITION BY series, win ORDER BY pos)
),
boundary AS (
  SELECT series, CAST(floor((max(win) + 1) * $TrainFrac) AS BIGINT) AS mwin
  FROM daywin GROUP BY series
),
bank AS (
  SELECT p.* FROM patches p JOIN boundary b USING (series) WHERE p.win < b.mwin
),
testp AS (
  SELECT p.* FROM patches p JOIN boundary b USING (series) WHERE p.win >= b.mwin
)
"""

  def q01: String = prefix + "SELECT series, t, n, v FROM grid"

  def q02: String = prefix + "SELECT series, t, floor((v_filled)*10000 + 0.5)/10000 AS v_filled, src FROM filled"

  def q03(size: Int, stride: Int): String = prefix + s"""
, memb AS (
  SELECT series, t, v_filled AS v, unnest([CAST(floor(t / $stride) AS BIGINT),
                                           CAST(floor(t / $stride) AS BIGINT) - 1]) AS swin
  FROM filled
), swindows AS (
  SELECT series, swin, count(v) AS nv, count(*) AS np,
         floor((avg(v))*10000 + 0.5)/10000 AS mean_v, floor((stddev_samp(v))*10000 + 0.5)/10000 AS std_v,
         floor((min(v))*10000 + 0.5)/10000 AS min_v, floor((max(v))*10000 + 0.5)/10000 AS max_v
  FROM memb
  WHERE t >= swin * $stride AND t < swin * $stride + $size AND swin >= 0
  GROUP BY series, swin
)
SELECT series, swin, mean_v, std_v, min_v, max_v
FROM swindows WHERE nv = $size AND np = $size"""

  def q04: String = prefix + """
SELECT f.series, f.t, floor(((f.v_filled - b.lo) / (b.hi - b.lo))*10000 + 0.5)/10000 AS vs
FROM filled f JOIN bounds b USING (series) WHERE f.v_filled IS NOT NULL"""

  def q05: String = prefix + "SELECT series, win, pos, v_orig, v_anom, is_anom FROM inject"

  def q06: String = prefix + "SELECT series, win, pos, ewma FROM feats"

  def q07: String = prefix + "SELECT series, win, pos, pstd FROM feats"

  def q08: String = prefix +
    "SELECT series, win, pos, floor((f0)*10000 + 0.5)/10000 AS f0, floor((f1)*10000 + 0.5)/10000 AS f1, floor((f2)*10000 + 0.5)/10000 AS f2, " +
    "floor((f3)*10000 + 0.5)/10000 AS f3, floor((f4)*10000 + 0.5)/10000 AS f4, floor((f5)*10000 + 0.5)/10000 AS f5, " +
    "floor((f6)*10000 + 0.5)/10000 AS f6, floor((f7)*10000 + 0.5)/10000 AS f7, floor((f8)*10000 + 0.5)/10000 AS f8 FROM patches"
}
