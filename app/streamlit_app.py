"""Interactive query browser — Spark-backed port of the reference's
``data-mgmt-streamlit.py`` (§3.2 entry point B).

Same page skeleton as the reference (query picker → metrics → full-text
search → numeric range filters → preview → chart → SQL viewer → CSV
download) but every dataflow step runs in Spark via
:mod:`customer_revenue_analysis_sql_tableau_spark.app_layer`; only the bounded preview and the
chart slice cross to the driver.

Run: ``streamlit run app/streamlit_app.py`` (streamlit/altair are app
dependencies only — the engine never imports them; this module guards
the imports so environments without them can still import the package).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    import streamlit as st
except ImportError as exc:  # pragma: no cover - app-only dependency
    raise SystemExit(
        "streamlit is not installed; the engine works without it — "
        "install streamlit to run the browsing app"
    ) from exc

try:
    import altair as alt
except ImportError:  # pragma: no cover
    alt = None

import __spark_entry__ as entrymod
from customer_revenue_analysis_sql_tableau_spark import app_layer
from customer_revenue_analysis_sql_tableau_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

st.set_page_config(page_title="Customer Revenue Analytics (Spark)", layout="wide")


@st.cache_resource
def spark():
    return get_spark("streamlit-app")


@st.cache_resource
def registry():
    return entrymod.queries(), entrymod.oracle_sql()


queries, oracles = registry()

with st.sidebar:
    st.subheader("Select Query")
    name = st.selectbox("Query", sorted(queries))

df = queries[name](spark(), SF_DIR)

st.markdown(f"### {name}")
metrics = app_layer.summary_metrics(df)
c1, c2, c3 = st.columns([2, 2, 4])
c1.metric("Rows", f"{metrics['rows']:,}")
c2.metric("Columns", f"{metrics['columns']:,}")
search = c3.text_input("Search across all columns", placeholder="Type to filter…")

df_filtered = app_layer.any_column_contains(df, search or "")

st.markdown("#### Numeric Range Filters")
num_cols = app_layer.numeric_columns(df_filtered)
if num_cols:
    bounds = app_layer.column_bounds(df_filtered, num_cols)
    with st.expander("Show/hide numeric filters", expanded=False):
        for col in num_cols:
            lo, hi = bounds[col]
            if lo is None or hi is None or lo == hi:
                continue
            lo_f, hi_f = float(lo), float(hi)
            chosen = st.slider(f"{col} range", lo_f, hi_f, (lo_f, hi_f))
            if chosen != (lo_f, hi_f):
                df_filtered = app_layer.range_filter(df_filtered, col, *chosen)
else:
    st.info("No numeric columns with a usable range to filter.")

st.markdown("#### Data Preview")
preview_pd = app_layer.preview(app_layer.dedupe_columns(df_filtered), 100).toPandas()
st.dataframe(preview_pd, use_container_width=True)

st.markdown("#### Quick Interactive Chart")
if alt is not None and len(preview_pd.columns) >= 2:
    left, right = st.columns([3, 2])
    with left:
        x_col = st.selectbox("X-axis", list(preview_pd.columns), index=0)
        y_col = st.selectbox("Y-axis", list(preview_pd.columns), index=1)
    with right:
        chart_type = st.radio("Chart type", ["Bar", "Line", "Area", "Scatter"])
    chart_df = app_layer.dedupe_columns(df_filtered)
    if x_col not in app_layer.numeric_columns(chart_df):
        chart_df = app_layer.top_n_filter(chart_df, x_col, 50)  # O7 cap
    data = chart_df.limit(5_000).toPandas()
    mark = {
        "Bar": alt.Chart(data).mark_bar(),
        "Line": alt.Chart(data).mark_line(),
        "Area": alt.Chart(data).mark_area(),
        "Scatter": alt.Chart(data).mark_circle(size=60),
    }[chart_type]
    st.altair_chart(
        mark.encode(x=alt.X(x_col, sort=None), y=alt.Y(y_col)).properties(
            height=380
        ),
        use_container_width=True,
    )

with st.expander("View SQL for this query"):
    sql = oracles.get(name)
    if sql:
        st.code(sql, language="sql")
    else:
        st.info("This operator has no single-statement SQL equivalent.")

st.markdown("#### Download")
st.download_button(
    "Download filtered CSV",
    data=app_layer.csv_bytes(df_filtered),
    file_name=f"{name}_filtered.csv",
    mime="text/csv",
)
