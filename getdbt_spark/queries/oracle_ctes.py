"""DuckDB oracle CTEs for the whole ported model DAG.

One (name, body) pair per model (or internal stage), in dependency
order; ``oracle_for(target)`` assembles ``WITH <fixtures>, <ctes>
SELECT * FROM target``.  DuckDB only evaluates CTEs reachable from the
final SELECT, so including the full chain costs nothing.

These re-express the reference models' semantics in DuckDB SQL over
the dialect-common fixture CTEs (fixtures.py) — independent text from
the Spark builders in models/, which is exactly what makes the
driver's hash comparison meaningful.
"""

from __future__ import annotations

from .. import fixtures as FX

V = '"360_graden_rapportage_vertaaltabel_upload_20_21"'
_EXCL_B = "('PP','RVD','RNW','SOCU','BVN','MTNL','EXT')"
_TV_FILTER = (
    "regexp_matches(channel, 'NPO') AND RepeatType = 'FIRST' AND "
    "audience = '6+' AND universe = 'Nat[SKO]' AND isoyear(date) >= 2019"
)

MODEL_CTES: list[tuple[str, str]] = [
    # run date = max CREDIBLE event date (mirrors io.run_date_anchor:
    # a poisoned far-future clock must not become "today"); COALESCE
    # to the Spark side's empty-corpus default so both engines agree
    # when events is empty or all-quarantined (r6 ADVICE)
    (
        "anchor",
        """SELECT coalesce(max(CAST(ts AS DATE))
             FILTER (WHERE ts < TIMESTAMP '2180-01-01'),
             DATE '2024-01-30') AS d FROM events""",
    ),
    (
        "spine",
        """SELECT CAST(unnest(generate_series(DATE '1995-01-02',
             (SELECT d FROM anchor), INTERVAL 7 DAY)) AS DATE) AS weekdate""",
    ),
    # -- source layer: latest-partition dedup ---------------------------
    (
        "quintly_youtube_allchannels_weekly",
        """SELECT * EXCLUDE (partitionDate)
           FROM quintly_youtube_allchannels_weekly_raw
           WHERE partitionDate = (SELECT max(partitionDate)
                                  FROM quintly_youtube_allchannels_weekly_raw)""",
    ),
    # -- poms_flattened -------------------------------------------------
    (
        "pf_flags",
        f"""SELECT
          id AS mid, type, sort_date, duration, age_rating,
          len(list_filter(genres,
              g -> starts_with(g.id, '3.0.1.1'))) > 0      AS is_youth_genre,
          len(list_filter(schedule_events,
              s -> s.net = 'ZAPP')) > 0                    AS is_zapp_net,
          len(list_filter(schedule_events,
              s -> s.net = 'ZAPPE')) > 0                   AS is_zappelin_net,
          list_max([e.mid_ref FOR e IN episode_of IF e.type = 'SERIES'])    AS episode_of_series,
          list_max([e.mid_ref FOR e IN episode_of IF e.type = 'SEASON'])    AS episode_of_season,
          list_max([e.mid_ref FOR e IN descendant_of IF e.type = 'SERIES']) AS descendant_of_series,
          list_max([e.mid_ref FOR e IN descendant_of IF e.type = 'SEASON']) AS descendant_of_season,
          list_max([e.mid_ref FOR e IN member_of IF e.type = 'SERIES'])     AS member_of_series,
          list_max([e.mid_ref FOR e IN member_of IF e.type = 'SEASON'])     AS member_of_season,
          len(broadcasters) AS n_broadcasters,
          list_filter(broadcasters,
              b -> b.id IS NULL OR b.id NOT IN {_EXCL_B})  AS bfilt
        FROM audiovisual_metadata_poms_metadata_v1""",
    ),
    (
        "pf_cols",
        """SELECT
          mid, type,
          CASE WHEN type = 'BROADCAST'
                 THEN coalesce(episode_of_series, member_of_series, descendant_of_series)
               WHEN type = 'SEASON' THEN member_of_series
               WHEN type = 'SEGMENT' THEN descendant_of_series
          END AS series_ref,
          CASE WHEN type = 'BROADCAST'
                 THEN coalesce(member_of_season, descendant_of_season, episode_of_season)
               WHEN type = 'SEGMENT' THEN descendant_of_season
          END AS season_ref,
          sort_date, duration,
          CASE WHEN is_zappelin_net OR (age_rating = 'ALL' AND is_youth_genre) THEN 6
               WHEN is_zappelin_net OR (age_rating IN ('ALL','6') AND is_youth_genre) THEN 9
               WHEN is_zapp_net OR is_zappelin_net
                    OR (age_rating IN ('ALL','6','9') AND is_youth_genre) THEN 12
          END AS min_age_classification,
          bfilt[1].id AS first_broadcaster
        FROM pf_flags
        WHERE n_broadcasters = 0 OR len(bfilt) > 0""",
    ),
    (
        "poms_flattened",
        """SELECT
          mid, type,
          CASE WHEN series_ref IS NULL OR series_ref = '' THEN mid ELSE series_ref END AS series_id,
          CASE WHEN season_ref IS NULL OR season_ref = '' THEN mid ELSE season_ref END AS season_id,
          min_age_classification, sort_date, duration, first_broadcaster,
          coalesce(first_broadcaster = 'NOS', false) AS is_nos_content
        FROM pf_cols""",
    ),
    # -- atinternet_smarttag_streams_daily_v4 ---------------------------
    (
        "adv_events",
        """SELECT DISTINCT
          CAST(beginTimeCET AS DATE)  AS adv_date,
          beginTimeCET                AS adv_beginTimeCET,
          endTimeCET                  AS adv_endTimeCET,
          unnest(generate_series(beginTimeCET, endTimeCET, INTERVAL 1 MINUTE))
                                      AS adv_minute,
          title                       AS adv_title,
          channel                     AS adv_channel,
          mediaId                     AS adv_mid
        FROM advantedge_tv_viewer_density_per_show_daily_v1
        WHERE regexp_matches(channel, 'NPO')""",
    ),
    (
        "raw_events",
        """SELECT
          e.d_rm_playid,
          e.d_visit_id || e.d_uv_id AS unique_user_id,
          e.d_date_hour_event,
          e.d_rm_action, e.d_rm_l2, e.d_rm_playback_time,
          string_split(e.d_rm_content, '_||_') AS content,
          a.adv_mid AS matched_livestream_id,
          string_split(e.d_rm_theme1, '_||_') AS theme1,
          CASE WHEN regexp_matches(e.d_rm_theme2, '_/|/|_')
               THEN string_split(e.d_rm_theme2, '_||_') END AS theme2,
          string_split(e.d_rm_theme3, '_||_') AS theme3,
          CASE WHEN a.adv_mid IS NOT NULL THEN 'livetvzender - streamID_matched'
               ELSE 'livetvzender - no_streamID_to_match' END AS stream_match_type,
          row_number() OVER (
            PARTITION BY e.d_rm_playid, e.d_visit_id || e.d_uv_id,
                         e.d_date_hour_event, e.d_rm_action, e.d_rm_playback_time
            ORDER BY date_diff('second', a.adv_beginTimeCET, e.d_date_hour_event) ASC
          ) AS dedup
        FROM media_events e
        JOIN live_stream_name_mapping_v1 m
          ON m.channel_id = NULLIF(string_split(e.d_rm_content, '_||_')[2], '')
        LEFT JOIN adv_events a
          ON m.channel = a.adv_channel
         AND date_trunc('minute', e.d_date_hour_event) = a.adv_minute
        WHERE e.d_rm_type <> 'Animations'
          AND e.d_rm_theme1 = 'livetvzender'
          AND CAST(e.d_date_hour_event AS DATE)
                BETWEEN (SELECT d - 8 FROM anchor) AND (SELECT d FROM anchor)

        UNION ALL
        SELECT
          d_rm_playid,
          d_visit_id || d_uv_id AS unique_user_id,
          d_date_hour_event,
          d_rm_action, d_rm_l2, d_rm_playback_time,
          string_split(d_rm_content, '_||_') AS content,
          NULL AS matched_livestream_id,
          string_split(d_rm_theme1, '_||_') AS theme1,
          CASE WHEN regexp_matches(d_rm_theme2, '_/|/|_')
               THEN string_split(d_rm_theme2, '_||_') END AS theme2,
          string_split(d_rm_theme3, '_||_') AS theme3,
          'regular streamid' AS stream_match_type,
          1 AS dedup
        FROM media_events
        WHERE d_rm_type <> 'Animations'
          AND (d_rm_theme1 IS NULL OR d_rm_theme1 <> 'livetvzender')
          AND CAST(d_date_hour_event AS DATE)
                BETWEEN (SELECT d - 8 FROM anchor) AND (SELECT d FROM anchor)""",
    ),
    (
        "agg_events_per_stream",
        """SELECT
          d_rm_playid, unique_user_id,
          CAST(d_date_hour_event AS DATE) AS evt_date,
          NULLIF(content[2], '') AS evt_base_mid,
          stream_match_type,
          coalesce(matched_livestream_id, NULLIF(content[2], '')) AS evt_mid,
          NULLIF(content[1], '') AS evt_media_name,
          NULLIF(NULLIF(theme1[1], ''), 'null') AS evt_stream_type,
          NULLIF(theme2[1], 'null') AS evt_programme,
          NULLIF(theme2[2], 'null') AS evt_broadcaster,
          theme2[3] AS evt_programme_podcast,
          theme3[1] AS evt_player_platform,
          theme3[2] AS evt_player_version,
          d_rm_l2 AS evt_brand,
          sum(d_rm_playback_time) AS evt_playback_time_total_in_sec,
          count(DISTINCT CASE WHEN d_rm_action = 'Play'
                    OR stream_match_type = 'livetvzender - streamID_matched'
                    THEN d_rm_playid END) AS evt_play_count_total
        FROM raw_events
        WHERE dedup = 1
        GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14""",
    ),
    (
        "agg_events_per_date",
        """SELECT
          evt_date, evt_mid, evt_base_mid, evt_media_name, stream_match_type,
          evt_stream_type, evt_programme, evt_broadcaster,
          evt_programme_podcast, evt_player_platform, evt_player_version,
          evt_brand,
          count(DISTINCT unique_user_id) AS n_unique_userids,
          -- ::BIGINT: DuckDB SUM(BIGINT) yields HUGEINT, which the
          -- driver's pandas fetch renders float64 ("14508.0") against
          -- Spark's bigint ("14508") — the CORRECTNESS_r03 hash-red
          -- root cause.  Cast every integer SUM the oracle outputs.
          CAST(sum(evt_playback_time_total_in_sec) AS BIGINT)
            AS evt_playback_time_total_in_sec,
          CAST(sum(evt_play_count_total) AS BIGINT) AS evt_play_count_total,
          CAST(sum(CASE WHEN evt_playback_time_total_in_sec >= 30
                   THEN evt_play_count_total ELSE 0 END) AS BIGINT)
            AS evt_play_count_over_30s
        FROM agg_events_per_stream
        GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12""",
    ),
    (
        "metadata_descendants",
        """SELECT id, type, mid_ref,
               row_number() OVER (PARTITION BY id, type
                                  ORDER BY id, type, mid_ref) AS idx
        FROM (
          SELECT md.id, (unnest(md.descendant_of)).type AS type,
                 (unnest(md.descendant_of)).mid_ref AS mid_ref
          FROM audiovisual_metadata_poms_metadata_v1 md
        ) x
        WHERE type IN ('SEASON', 'SERIES')""",
    ),
    (
        "md_episode",
        """SELECT id, max(CASE WHEN e_type = 'SEASON' THEN e_index END) AS idx
        FROM (
          SELECT md.id, (unnest(md.episode_of)).type AS e_type,
                 (unnest(md.episode_of)).index AS e_index
          FROM audiovisual_metadata_poms_metadata_v1 md
        ) x
        GROUP BY 1""",
    ),
    (
        "md_bcast",
        """SELECT id, string_agg(v, ',' ORDER BY v) AS broadcasters
        FROM (
          SELECT md.id, (unnest(md.broadcasters)).value AS v
          FROM audiovisual_metadata_poms_metadata_v1 md
        ) x
        GROUP BY 1""",
    ),
    (
        "md_channels",
        """SELECT id, channel, row_number() OVER (PARTITION BY id
                                               ORDER BY id, channel) AS idx
        FROM (
          SELECT DISTINCT md.id, (unnest(md.schedule_events)).channel AS channel
          FROM audiovisual_metadata_poms_metadata_v1 md
        ) x
        WHERE channel IN ('NED1', 'NED2', 'NED3')""",
    ),
    (
        "md_meta",
        """SELECT
          md.id,
          md.duration // 1000 AS mtd_duration_in_sec,
          md.sort_date AS mtd_sort_date,
          md.type AS mtd_type,
          md.genres[1].terms[1] AS mtd_genre_main,
          md.genres[1].terms[2] AS mtd_genre_sub,
          md.titles[1].value AS mtd_title_main,
          md.titles[2].value AS mtd_title_sub,
          season.mid_ref AS mtd_season_mid,
          series.mid_ref AS mtd_series_mid,
          md_episode.idx AS mtd_episode_of_index,
          md_channels.channel AS mtd_channel,
          md_bcast.broadcasters AS mtd_broadcasters
        FROM audiovisual_metadata_poms_metadata_v1 md
        LEFT JOIN metadata_descendants season
          ON season.id = md.id AND season.type = 'SEASON' AND season.idx = 1
        LEFT JOIN metadata_descendants series
          ON series.id = md.id AND series.type = 'SERIES' AND series.idx = 1
        LEFT JOIN md_episode ON md_episode.id = md.id
        LEFT JOIN md_bcast ON md_bcast.id = md.id
        LEFT JOIN md_channels ON md_channels.id = md.id AND md_channels.idx = 1""",
    ),
    (
        "atinternet_smarttag_streams_daily_v4",
        """SELECT
          a.evt_date, a.evt_mid, a.evt_base_mid, a.evt_media_name,
          a.stream_match_type, a.evt_stream_type, a.evt_programme,
          a.evt_broadcaster, a.evt_programme_podcast, a.evt_player_platform,
          a.evt_player_version, a.evt_brand, a.n_unique_userids,
          a.evt_playback_time_total_in_sec, a.evt_play_count_total,
          a.evt_play_count_over_30s,
          m.mtd_duration_in_sec, m.mtd_sort_date, m.mtd_type,
          m.mtd_genre_main, m.mtd_genre_sub, m.mtd_title_main, m.mtd_title_sub,
          m.mtd_season_mid, m.mtd_series_mid, m.mtd_episode_of_index,
          m.mtd_channel, m.mtd_broadcasters
        FROM agg_events_per_date a
        LEFT JOIN md_meta m ON m.id = a.evt_mid""",
    ),
    # -- quintly/ati marts ----------------------------------------------
    (
        "integral_reporting_facebook",
        f"""SELECT
          v.Target_FB_pagelikes, v.Target_FB_reachperpost, v.QL_FB_ID,
          s.weekdate, weekofyear(s.weekdate) AS weeknr,
          isoyear(s.weekdate) AS year,
          fb.fans AS fb_fans, fb.fansChange AS fb_fans_change,
          fb.ownPosts AS fb_number_of_posts,
          fb.pageImpressionsUnique AS fb_reach_per_week,
          fb.ownPostsEngagement AS fb_engagement_per_week
        FROM {V} v
        CROSS JOIN spine s
        LEFT JOIN quintly_facebook_pages_weekly fb
          ON v.QL_FB_ID = fb.profileId
         AND isoyear(fb.intervalBegin) = isoyear(s.weekdate)
         AND weekofyear(fb.intervalBegin) = weekofyear(s.weekdate)
        WHERE v.Naam IS NOT NULL""",
    ),
    (
        "integral_reporting_instagram",
        f"""SELECT
          v.Target_IG_followers, v.Target_IG_reachperpost, v.QL_IG_ID,
          s.weekdate, weekofyear(s.weekdate) AS weeknr,
          isoyear(s.weekdate) AS year,
          ig.followers AS ig_followers, ig.followersChange AS ig_followers_change,
          ig.posts AS ig_number_of_posts, ig.postschange AS ig_number_of_posts_change,
          ig.reach AS ig_reach_per_week, ig.totalengagement AS ig_engagement_per_week
        FROM {V} v
        CROSS JOIN spine s
        LEFT JOIN quintly_instagram_pages_weekly ig
          ON v.QL_IG_ID = ig.profileId
         AND isoyear(ig.intervalBegin) = isoyear(s.weekdate)
         AND weekofyear(ig.intervalBegin) = weekofyear(s.weekdate)
        WHERE v.Naam IS NOT NULL""",
    ),
    (
        "integral_reporting_youtube",
        f"""SELECT
          v.Target_YT_subscribers, v.Target_YT_views, v.QL_YT_ID,
          s.weekdate, weekofyear(s.weekdate) AS weeknr,
          isoyear(s.weekdate) AS year,
          yt.totalSubscribers AS yt_total_subscribers,
          yt.totalSubscribersChange AS yt_total_subscribers_change,
          yt.totalVideos AS yt_number_of_videos,
          yt.views AS yt_views_per_week,
          yt.estimatedminuteswatched AS yt_time_spent_per_week_min,
          yt.totalengagement AS yt_engagement_per_week,
          yt.averageViewPercentage AS yt_view_percentage,
          yt.averageViewDuration AS yt_view_duration,
          (yt.averageViewPercentage / 100) * yt.views AS yt_kdh_per_week
        FROM {V} v
        CROSS JOIN spine s
        LEFT JOIN quintly_youtube_allchannels_weekly yt
          ON v.QL_YT_ID = yt.profileId
         AND isoyear(yt.intervalBegin) = isoyear(s.weekdate)
         AND weekofyear(yt.intervalBegin) = weekofyear(s.weekdate)
        WHERE v.Naam IS NOT NULL""",
    ),
    (
        "ati_union",
        """SELECT level_2, platform, weekdate, weeknum, year,
               weekly_visitors, daily_visitors, visits
        FROM atinternet_smarttag_pages_weekly_v2
        UNION ALL
        SELECT level_2 || ' - ' || programme AS level_2, platform, weekdate,
               weeknum, year, weekly_visitors, daily_visitors, visits
        FROM atinternet_smarttag_pages_programmes_weekly_v2""",
    ),
    (
        "integral_reporting_sites_and_apps",
        f"""SELECT
          v.Target_AT_app, v.Target_AT_site, v.ATI_Titel,
          s.weekdate, weekofyear(s.weekdate) AS weeknr,
          isoyear(s.weekdate) AS year,
          sum(CASE WHEN a.platform LIKE 'app' THEN a.weekly_visitors END) AS app_weekly_visitors,
          sum(CASE WHEN a.platform LIKE 'site' THEN a.weekly_visitors END) AS site_weekly_visitors,
          sum(CASE WHEN a.platform LIKE 'app' THEN a.daily_visitors END) AS app_daily_visitors,
          sum(CASE WHEN a.platform LIKE 'site' THEN a.daily_visitors END) AS site_daily_visitors,
          sum(CASE WHEN a.platform LIKE 'app' THEN a.visits END) AS app_visits,
          sum(CASE WHEN a.platform LIKE 'site' THEN a.visits END) AS site_visits
        FROM {V} v
        CROSS JOIN spine s
        LEFT JOIN ati_union a
          ON v.ATI_Titel = a.level_2
         AND a.year = isoyear(s.weekdate)
         AND a.weeknum = weekofyear(s.weekdate)
        WHERE v.Naam IS NOT NULL
        GROUP BY 1, 2, 3, 4, 5, 6""",
    ),
    # -- tvbroadcasts ----------------------------------------------------
    (
        "tv_ep",
        f"""SELECT
          title, date, mediaId,
          p.series_ref AS poms_series_id,
          p.series_title AS poms_series_title,
          channel,
          date_diff('minute', min(beginTimeCET), min(endTimeCET)) AS ep_duration_min,
          sum(kdh) AS kdh,
          date_diff('minute', min(beginTimeCET), min(endTimeCET)) * sum(kdh) AS time_spent
        FROM advantedge_tv_viewer_density_per_show_daily_v1 a
        LEFT JOIN dim_poms_episodes p ON p.episode_id = a.mediaId
        WHERE {_TV_FILTER}
        GROUP BY 1, 2, 3, 4, 5, 6""",
    ),
    (
        "tv_title",
        """SELECT
          poms_series_id, poms_series_title,
          weekofyear(date) AS weeknr, isoyear(date) AS year,
          count(DISTINCT mediaId || ' - ' || CAST(date AS STRING)) AS tv_number_of_broadcasts,
          sum(ep_duration_min) AS tv_duration_min,
          sum(kdh) AS tv_sum_kdh_per_week,
          sum(time_spent) AS tv_time_spent_per_week_min
        FROM tv_ep
        GROUP BY 1, 2, 3, 4""",
    ),
    (
        "integral_reporting_tvbroadcasts",
        f"""SELECT
          v.Naam, v.Net, v.Omroep, v.CCC,
          s.weekdate, t.weeknr, t.year,
          CASE WHEN t.poms_series_title IS NOT NULL THEN 1 ELSE 0 END AS tv_broadcast_week,
          t.poms_series_id, t.poms_series_title,
          t.tv_number_of_broadcasts, t.tv_duration_min,
          t.tv_sum_kdh_per_week, t.tv_time_spent_per_week_min
        FROM spine s
        LEFT JOIN tv_title t
          ON weekofyear(s.weekdate) = t.weeknr AND t.year = isoyear(s.weekdate)
        LEFT JOIN {V} v ON v.Serie_mid = t.poms_series_id""",
    ),
    # -- vodstreaming ----------------------------------------------------
    (
        "new_tv_eps",
        f"""SELECT
          a.title, a.date AS first_broadcast_date, a.beginTimeCET AS start_eps,
          a.mediaId,
          pf.season_id AS channel,
          date_diff('minute', a.beginTimeCET, a.endTimeCET) AS ep_duration_min,
          min(a.date) OVER (PARTITION BY pf.season_id) AS first_known_eps_date_season,
          max(a.date) OVER (PARTITION BY pf.season_id) AS last_known_eps_date_season
        FROM advantedge_tv_viewer_density_per_show_daily_v1 a
        LEFT JOIN poms_flattened pf ON pf.mid = a.mediaId
        WHERE {_TV_FILTER}""",
    ),
    (
        "fsd",
        """SELECT evt_mid, min(evt_date) AS first_stream_day
        FROM (
          SELECT evt_mid, evt_date, sum(evt_play_count_over_30s) AS spc
          FROM atinternet_smarttag_streams_daily_v4
          WHERE mtd_type = 'BROADCAST'
          GROUP BY 1, 2
        ) x
        WHERE spc >= 100
        GROUP BY 1""",
    ),
    (
        "new_releases",
        """SELECT DISTINCT
          p.episode_id AS mediaid, p.series_ref, p.series_title,
          p.episode_type, p.season_ref,
          p.index AS eps_nr, p.season_index AS season_nr,
          coalesce(n.first_broadcast_date,
            CASE WHEN date_diff('day', f.first_stream_day,
                      CAST(p.start_linear_first_broadcast AS DATE)) >= 90
                 THEN f.first_stream_day
                 ELSE CAST(p.start_linear_first_broadcast AS DATE) END)
            AS first_broadcast_date_res,
          CASE WHEN n.first_broadcast_date IS NULL THEN 0 ELSE 1 END
            AS has_had_linear_release,
          CASE WHEN coalesce(n.first_broadcast_date,
                    CAST(p.start_linear_first_broadcast AS DATE)) IS NULL
               THEN 0 ELSE 1 END AS has_scheduled_lineair_release,
          min(coalesce(n.first_broadcast_date,
            CASE WHEN date_diff('day', f.first_stream_day,
                      CAST(p.start_linear_first_broadcast AS DATE)) >= 90
                 THEN f.first_stream_day
                 ELSE CAST(p.start_linear_first_broadcast AS DATE) END))
            OVER (PARTITION BY p.season_ref) AS first_broadcast_season,
          max(coalesce(n.first_broadcast_date,
            CASE WHEN date_diff('day', f.first_stream_day,
                      CAST(p.start_linear_first_broadcast AS DATE)) >= 90
                 THEN f.first_stream_day
                 ELSE CAST(p.start_linear_first_broadcast AS DATE) END))
            OVER (PARTITION BY p.season_ref) AS last_known_broadcast_season
        FROM dim_poms_episodes p
        LEFT JOIN new_tv_eps n ON p.episode_id = n.mediaId
        LEFT JOIN fsd f ON f.evt_mid = p.episode_id
        WHERE p.episode_type = 'BROADCAST'""",
    ),
    (
        "streaming_info",
        """SELECT
          st.evt_mid, p.series_ref, p.series_title, st.evt_programme,
          weekofyear(nr.first_broadcast_date_res) AS evt_weeknr,
          isoyear(nr.first_broadcast_date_res) AS evt_year,
          avg(st.mtd_duration_in_sec) AS streaming_duration_sec,
          CAST(NULL AS BIGINT) AS streaming_playcount_over_30s,
          CAST(NULL AS BIGINT) AS streaming_playcount_over_30s_broadcastsonly,
          CAST(NULL AS BIGINT) AS streaming_time_spent_sec,
          sum(CASE WHEN st.mtd_type = 'BROADCAST'
                    AND date_diff('day', nr.last_known_broadcast_season, st.evt_date) <= 28
                   THEN st.evt_playback_time_total_in_sec ELSE 0 END)
            / nullif(max(CASE WHEN st.mtd_type = 'BROADCAST'
                    AND date_diff('day', nr.last_known_broadcast_season, st.evt_date) <= 28
                   THEN st.mtd_duration_in_sec ELSE 0 END), 0)
            AS streaming_kdh_for_new_released_episode,
          max(CASE WHEN st.mtd_type = 'BROADCAST'
                    AND date_diff('day', nr.last_known_broadcast_season, st.evt_date) <= 28
                   THEN st.evt_mid END) AS mid_counts_for_new_release,
          CAST(NULL AS DOUBLE) AS streaming_kdh_per_episode,
          max(CASE WHEN nr.has_had_linear_release = 1 THEN 1 ELSE 0 END)
            AS has_had_linear_release,
          max(CASE WHEN nr.has_had_linear_release = 0
                    AND nr.has_scheduled_lineair_release = 1 THEN 1 ELSE 0 END)
            AS has_scheduled_lineair_release,
          max(CASE WHEN nr.has_had_linear_release = 0
                    AND nr.has_scheduled_lineair_release = 0 THEN 1 ELSE 0 END)
            AS vod_only_release
        FROM atinternet_smarttag_streams_daily_v4 st
        LEFT JOIN new_releases nr ON nr.mediaid = st.evt_mid
        LEFT JOIN dim_poms_episodes p ON p.episode_id = st.evt_mid
        GROUP BY 1, 2, 3, 4, 5, 6

        UNION ALL
        SELECT
          st.evt_mid, p.series_ref, p.series_title, st.evt_programme,
          weekofyear(st.evt_date) AS evt_weeknr,
          isoyear(st.evt_date) AS evt_year,
          avg(st.mtd_duration_in_sec) AS streaming_duration_sec,
          sum(st.evt_play_count_over_30s) AS streaming_playcount_over_30s,
          sum(CASE WHEN st.mtd_type = 'BROADCAST'
                   THEN st.evt_play_count_over_30s ELSE 0 END)
            AS streaming_playcount_over_30s_broadcastsonly,
          sum(st.evt_playback_time_total_in_sec) AS streaming_time_spent_sec,
          CAST(NULL AS DOUBLE) AS streaming_kdh_for_new_released_episode,
          CAST(NULL AS STRING) AS mid_counts_for_new_release,
          sum(st.evt_playback_time_total_in_sec)
            / nullif(avg(st.mtd_duration_in_sec), 0) AS streaming_kdh_per_episode,
          CAST(NULL AS INT) AS has_had_linear_release,
          CAST(NULL AS INT) AS has_scheduled_lineair_release,
          CAST(NULL AS INT) AS vod_only_release
        FROM atinternet_smarttag_streams_daily_v4 st
        LEFT JOIN dim_poms_episodes p ON p.episode_id = st.evt_mid
        GROUP BY 1, 2, 3, 4, 5, 6""",
    ),
    (
        "integral_reporting_vodstreaming",
        f"""SELECT
          coalesce(v.Stream_Titel, str.series_title) AS Stream_join_title,
          str.series_title AS POMS_series_title,
          str.series_ref AS POMS_series_id,
          CASE WHEN v.Stream_Titel IS NULL THEN 0 ELSE 1 END AS has_intekening,
          s.weekdate,
          weekofyear(s.weekdate) AS weeknr,
          isoyear(s.weekdate) AS year,
          count(DISTINCT str.evt_mid) AS streaming_number_of_episodes,
          sum(str.streaming_duration_sec) AS streaming_duration_sec,
          -- BIGINT casts: DuckDB leaves integer SUMs as HUGEINT, which
          -- fetchdf renders float64; on an all-populated corpus the
          -- Spark column is int64 and the driver's dtype-class check
          -- goes red (at sf0.01 nulls masked it: both sides float64)
          CAST(sum(str.streaming_playcount_over_30s) AS BIGINT)
            AS streaming_playcount_over_30s,
          CAST(sum(str.streaming_playcount_over_30s_broadcastsonly) AS BIGINT)
            AS streaming_playcount_over_30s_broadcastsonly,
          CAST(sum(str.streaming_time_spent_sec) AS BIGINT)
            AS streaming_time_spent_sec,
          sum(str.streaming_kdh_per_episode) AS streaming_sum_kdh_per_week,
          sum(str.streaming_kdh_for_new_released_episode)
            AS streaming_kdh_for_new_released_episode,
          count(DISTINCT str.mid_counts_for_new_release)
            AS streaming_number_of_new_released_eps,
          max(str.has_had_linear_release) AS week_with_new_lineair_release,
          max(CASE WHEN str.has_had_linear_release = 1
                    OR str.has_scheduled_lineair_release = 1
                    OR str.vod_only_release = 1 THEN 1 ELSE 0 END)
            AS week_with_new_release
        FROM spine s
        LEFT JOIN streaming_info str
          ON str.evt_year = isoyear(s.weekdate)
         AND str.evt_weeknr = weekofyear(s.weekdate)
        LEFT JOIN {V} v ON v.Serie_mid = str.series_ref
        GROUP BY 1, 2, 3, 4, 5""",
    ),
    # -- dashboard -------------------------------------------------------
    (
        "basis",
        f"""SELECT v.*, s.weekdate,
          weekofyear(s.weekdate) AS weeknr, isoyear(s.weekdate) AS year
        FROM {V} v CROSS JOIN spine s""",
    ),
    (
        "intekening_cleaning",
        """SELECT
          coalesce(ss.POMS_series_id, tvb.poms_series_id) AS poms_series_id,
          coalesce(ss.year, tvb.year) AS year,
          sum(ss.streaming_playcount_over_30s_broadcastsonly) AS n_views_in_reportingyear,
          sum(tvb.tv_number_of_broadcasts) AS n_broadcasts_in_year
        FROM integral_reporting_vodstreaming ss
        FULL OUTER JOIN integral_reporting_tvbroadcasts tvb
          ON tvb.poms_series_id = ss.POMS_series_id
         AND tvb.year = ss.year AND tvb.weeknr = ss.weeknr
        GROUP BY 1, 2
        HAVING sum(ss.streaming_playcount_over_30s_broadcastsonly) >= 1000
            OR sum(tvb.tv_number_of_broadcasts) >= 1""",
    ),
    (
        "union_of_channels",
        """SELECT
          b.Naam, b.Net, b.Omroep, b.CCC, b.weekdate, b.weeknr, b.year,
          CASE WHEN b.Naam IS NOT NULL THEN 1 ELSE 0 END AS has_intekening,
          CAST(NULL AS INT) AS is_tv_week,
          CAST(NULL AS BIGINT) AS new_releases,
          'facebook' AS reporting_channel,
          fb.fb_number_of_posts AS n_items_per_week,
          'posts' AS media_item_type,
          fb.fb_reach_per_week AS weekly_reach_per_week,
          CAST(NULL AS BIGINT) AS daily_reach_per_week,
          CAST(NULL AS BIGINT) AS visits_per_week,
          fb.fb_engagement_per_week AS engagement_per_week,
          CAST(NULL AS BIGINT) AS views_per_week,
          CAST(NULL AS DOUBLE) AS hours_watched,
          CAST(NULL AS DOUBLE) AS video_kdh_per_week,
          CAST(NULL AS DOUBLE) AS video_kdh_per_release
        FROM basis b
        LEFT JOIN integral_reporting_facebook fb
          ON b.QL_FB_ID = fb.QL_FB_ID AND b.weekdate = fb.weekdate

        UNION ALL
        SELECT
          b.Naam, b.Net, b.Omroep, b.CCC, b.weekdate, b.weeknr, b.year,
          CASE WHEN b.Naam IS NOT NULL THEN 1 ELSE 0 END,
          CAST(NULL AS INT), CAST(NULL AS BIGINT),
          'instagram',
          ig.ig_number_of_posts, 'posts',
          ig.ig_reach_per_week,
          CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
          CAST(ig.ig_engagement_per_week AS DOUBLE),
          CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
          CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM basis b
        LEFT JOIN integral_reporting_instagram ig
          ON b.QL_IG_ID = ig.QL_IG_ID AND b.weekdate = ig.weekdate

        UNION ALL
        SELECT
          b.Naam, b.Net, b.Omroep, b.CCC, b.weekdate, b.weeknr, b.year,
          CASE WHEN b.Naam IS NOT NULL THEN 1 ELSE 0 END,
          CAST(NULL AS INT), CAST(NULL AS BIGINT),
          'sites',
          CAST(NULL AS BIGINT), CAST(NULL AS STRING),
          o.site_weekly_visitors, o.site_daily_visitors, o.site_visits,
          CAST(NULL AS DOUBLE),
          CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
          CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM basis b
        LEFT JOIN integral_reporting_sites_and_apps o
          ON b.ATI_Titel = o.ATI_Titel AND b.weekdate = o.weekdate

        UNION ALL
        SELECT
          b.Naam, b.Net, b.Omroep, b.CCC, b.weekdate, b.weeknr, b.year,
          CASE WHEN b.Naam IS NOT NULL THEN 1 ELSE 0 END,
          CAST(NULL AS INT), CAST(NULL AS BIGINT),
          'apps',
          CAST(NULL AS BIGINT), CAST(NULL AS STRING),
          o.app_weekly_visitors, o.app_daily_visitors, o.app_visits,
          CAST(NULL AS DOUBLE),
          CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
          CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM basis b
        LEFT JOIN integral_reporting_sites_and_apps o
          ON b.ATI_Titel = o.ATI_Titel AND b.weekdate = o.weekdate

        UNION ALL
        SELECT
          b.Naam, b.Net, b.Omroep, b.CCC, b.weekdate, b.weeknr, b.year,
          CASE WHEN b.Naam IS NOT NULL THEN 1 ELSE 0 END,
          CAST(NULL AS INT), CAST(NULL AS BIGINT),
          'youtube',
          yt.yt_number_of_videos, 'videos',
          CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
          CAST(yt.yt_engagement_per_week AS DOUBLE),
          yt.yt_views_per_week,
          round(yt.yt_time_spent_per_week_min / 60, 2),
          round(yt.yt_kdh_per_week, 0),
          CAST(NULL AS DOUBLE)
        FROM basis b
        LEFT JOIN integral_reporting_youtube yt
          ON b.QL_YT_ID = yt.QL_YT_ID AND b.weekdate = yt.weekdate

        UNION ALL
        SELECT
          coalesce(b.Naam, tv.poms_series_title),
          b.Net, b.Omroep, b.CCC,
          coalesce(b.weekdate, tv.weekdate),
          coalesce(b.weeknr, tv.weeknr),
          coalesce(b.year, tv.year),
          CASE WHEN b.Naam IS NOT NULL THEN 1 ELSE 0 END,
          tv.tv_broadcast_week,
          tv.tv_number_of_broadcasts,
          'lineair',
          tv.tv_number_of_broadcasts, 'videos',
          CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
          CAST(NULL AS DOUBLE),
          CAST(NULL AS BIGINT),
          round(tv.tv_time_spent_per_week_min / 60, 2),
          round(tv.tv_sum_kdh_per_week, 0),
          round(tv.tv_sum_kdh_per_week / nullif(tv.tv_number_of_broadcasts, 0), 0)
        FROM integral_reporting_tvbroadcasts tv
        LEFT JOIN basis b
          ON b.Serie_mid = tv.poms_series_id AND b.weekdate = tv.weekdate

        UNION ALL
        SELECT
          coalesce(b.Naam, s.POMS_series_title) AS Naam,
          b.Net, b.Omroep, b.CCC,
          coalesce(b.weekdate, s.weekdate) AS weekdate,
          coalesce(b.weeknr, s.weeknr) AS weeknr,
          coalesce(b.year, s.year) AS year,
          max(CASE WHEN b.Naam IS NOT NULL THEN 1 ELSE 0 END),
          CAST(NULL AS INT), CAST(NULL AS BIGINT),
          'VOD',
          sum(s.streaming_number_of_episodes), 'videos',
          CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
          CAST(NULL AS DOUBLE),
          sum(s.streaming_playcount_over_30s),
          round(sum(s.streaming_time_spent_sec / 60 / 60), 2),
          round(sum(s.streaming_sum_kdh_per_week), 0),
          round(sum(s.streaming_kdh_for_new_released_episode)
                / nullif(sum(s.streaming_number_of_new_released_eps), 0), 0)
        FROM integral_reporting_vodstreaming s
        JOIN intekening_cleaning scc
          ON scc.poms_series_id = s.POMS_series_id AND scc.year = s.year
        LEFT JOIN basis b
          ON b.Serie_mid = s.POMS_series_id AND b.weekdate = s.weekdate
        GROUP BY 1, 2, 3, 4, 5, 6, 7""",
    ),
    (
        "integral_reporting_dashboard_channel_weekly",
        """SELECT
          Naam, Net, Omroep, CCC, weekdate, weeknr, year,
          reporting_channel, n_items_per_week, media_item_type,
          weekly_reach_per_week, daily_reach_per_week, visits_per_week,
          engagement_per_week, views_per_week, hours_watched,
          video_kdh_per_week, video_kdh_per_release,
          round(engagement_per_week
                / nullif(CASE WHEN reporting_channel = 'youtube'
                              THEN views_per_week
                              ELSE weekly_reach_per_week END, 0), 3)
            AS engagement_ratio,
          round(daily_reach_per_week / nullif(weekly_reach_per_week, 0), 2)
            AS dau_mau_ratio,
          max(is_tv_week) OVER (PARTITION BY weekdate, Naam) AS is_tv_week,
          CAST(sum(CASE WHEN reporting_channel = 'lineair' THEN new_releases
                   ELSE 0 END) OVER (PARTITION BY Naam) AS BIGINT)
            AS n_total_tv_broadcasts,
          max(has_intekening) OVER (PARTITION BY Naam) AS has_intekening,
          CASE
            WHEN avg(CASE WHEN reporting_channel = 'lineair'
                          THEN video_kdh_per_release ELSE 0 END)
                 OVER (PARTITION BY Naam) < 100000
              THEN 'avg lineaire KDH < 100.000'
            WHEN avg(CASE WHEN reporting_channel = 'lineair'
                          THEN video_kdh_per_release ELSE 0 END)
                 OVER (PARTITION BY Naam) >= 4000000
              THEN 'avg lineaire KDH > 4.000.000'
            WHEN avg(CASE WHEN reporting_channel = 'lineair'
                           AND video_kdh_per_release IS NOT NULL
                          THEN 1 ELSE 0 END) OVER (PARTITION BY Naam) = 0
              THEN 'no lineair KDH in this week'
            ELSE 'avg lineaire KDH >= 100.000 and < 4.0000.000'
          END AS lineair_kdh_bucket
        FROM union_of_channels""",
    ),
]


def oracle_for(target: str) -> str:
    """Full oracle SQL: fixtures + model CTE chain, selecting ``target``."""
    ctes = ", ".join(f"{n} AS ({b})" for n, b in MODEL_CTES)
    return f"WITH {FX.fixture_ctes(list(FX.FIXTURES))}, {ctes} SELECT * FROM {target}"
