"""Execution-match cases replicating the reference benchmark's query
surface (SURVEY.md §2 operator ids; shapes cited to
/root/reference/eval/data/dev.json lines) on the harness fixtures.

Each case runs on BOTH our engine and DuckDB via harness.oracle — the
same protocol the reference's evaluator uses. The SQL here is written
against FIXTURES.md-shaped data; the dev.json citations mark which gold
case pins the shape.
"""

from .oracle import Case

# --- laptop database -------------------------------------------------------

LAPTOP_CASES = [
    Case("filter_eq", "laptop",  # dev.json:28
         "SELECT model FROM products WHERE maker = 'B'"),
    Case("filter_neq", "laptop",  # dev.json:36
         "SELECT model, type FROM products WHERE maker <> 'B'"),
    Case("scalar_avg", "laptop",  # dev.json:44
         "SELECT AVG(speed) AS avg_speed FROM laptops WHERE speed >= 2.00"),
    Case("agg_max_bool_str", "laptop",  # dev.json:52
         "SELECT MAX(price) AS max_price FROM printers "
         "WHERE color = 'TRUE' AND type = 'laser'"),
    Case("like_or", "laptop",  # dev.json:60,68
         "SELECT MIN(paid) AS min_paid FROM sales "
         "WHERE type_of_payment LIKE '%visa%'"),
    Case("quoted_alias_arith", "laptop",  # dev.json:76
         "SELECT price/0.85 AS 'price (USD)' FROM laptops WHERE ram >= 1024"),
    Case("group_having_count", "laptop",  # dev.json:84
         "SELECT maker FROM products GROUP BY maker HAVING COUNT(maker) > 4"),
    Case("order_desc", "laptop",  # dev.json:92
         "SELECT model, speed FROM laptops ORDER BY speed DESC, model"),
    Case("join_group_order_count", "laptop",  # dev.json:100
         "SELECT c.city, COUNT(s.model) AS n FROM customers c "
         "JOIN sales s ON c.customer_id = s.customer_id "
         "GROUP BY c.city ORDER BY n DESC, c.city"),
    Case("join_distinct", "laptop",  # dev.json:108
         "SELECT DISTINCT p.maker FROM products p "
         "JOIN sales s ON p.model = s.model"),
    Case("join_group_avg", "laptop",  # dev.json:116
         "SELECT c.city, AVG(s.paid) AS avg_paid FROM customers c "
         "JOIN sales s ON c.customer_id = s.customer_id GROUP BY c.city"),
    Case("group_max_per_color", "laptop",  # dev.json:124
         "SELECT color, MAX(price) AS max_price FROM printers GROUP BY color"),
    Case("top1_order_limit", "laptop",  # dev.json:132,140
         "SELECT model FROM laptops ORDER BY price DESC LIMIT 1"),
    Case("three_way_join_topk", "laptop",  # dev.json:12
         "SELECT c.customer_id, c.firstname, c.lastname, COUNT(*) AS cnt "
         "FROM customers c JOIN sales s ON c.customer_id = s.customer_id "
         "JOIN products p ON s.model = p.model "
         "GROUP BY c.customer_id, c.firstname, c.lastname "
         "ORDER BY cnt DESC, c.customer_id LIMIT 1"),
    Case("star_exclude", "laptop",  # dev.json:180
         "SELECT * EXCLUDE (address, email) FROM customers ORDER BY customer_id"),
    Case("star_replace_upper", "laptop",  # dev.json:404
         "SELECT * REPLACE (upper(city) AS city) FROM customers ORDER BY customer_id"),
    Case("columns_regex_len", "laptop",  # dev.json:396
         "SELECT LENGTH(COLUMNS('name$')) FROM customers ORDER BY firstname"),
    Case("string_index", "laptop",  # dev.json:460
         "SELECT firstname[1] AS initial FROM customers ORDER BY customer_id"),
    Case("string_slice_filter", "laptop",  # dev.json:292-ish on fixtures
         "SELECT customer_id FROM customers WHERE email[:4] = 'test'"),
    Case("group_by_all", "laptop",  # dev.json:268
         "SELECT customer_id, model, sum(paid) AS total_paid FROM sales "
         "GROUP BY ALL ORDER BY ALL"),
    Case("order_by_all_exclude", "laptop",  # dev.json:580,588
         "SELECT * EXCLUDE (screen) FROM laptops WHERE price > 1000 ORDER BY ALL"),
    Case("cast_coloncolon_round", "laptop",  # dev.json:428 — :: rounds
         "SELECT model, speed::INTEGER AS speed_int FROM laptops ORDER BY model"),
    Case("having_on_alias", "transactions",  # dev.json:20
         "SELECT u.name, sum(t.amount) AS balance FROM users u "
         "JOIN transactions t ON u.id = t.user_id "
         "GROUP BY u.name HAVING balance = 0"),
    Case("null_filter", "hn",  # dev.json:4
         "SELECT title FROM hacker_news WHERE url IS NOT NULL ORDER BY title"),
    Case("domain_extract_topk", "hn",  # dev.json:4
         "SELECT SUBSTRING(SPLIT_PART(url, '//', 2), 1, "
         "POSITION('/' IN SPLIT_PART(url, '//', 2)) - 1) AS domain, "
         "COUNT(*) AS count FROM hacker_news WHERE url IS NOT NULL "
         "GROUP BY domain ORDER BY count DESC, domain LIMIT 10"),
    Case("regexp_email", "hn",  # dev.json:292
         "SELECT regexp_extract(text, '([a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,})', 0) "
         "AS email FROM hacker_news WHERE text LIKE '%@%' ORDER BY email"),
    # DDL / DML (dev.json:228,236,444,452,516,524)
    Case("create_insert_select", "laptop",
         "SELECT * FROM tmp_products ORDER BY model",
         setup_sql="CREATE TABLE IF NOT EXISTS tmp_products ("
                   "maker varchar(10), model varchar(10), type varchar(10)); "
                   "INSERT INTO tmp_products VALUES ('A', '9001', 'pc'), ('B', '9002', 'laptop')"),
    Case("update_set_null", "laptop",
         "UPDATE customers SET address = NULL WHERE customer_id = '1'",
         validation_sql="SELECT customer_id, address FROM customers ORDER BY customer_id"),
    Case("delete_where", "laptop",
         "DELETE FROM sales WHERE paid < 500",
         validation_sql="SELECT count(*) AS n FROM sales"),
    Case("describe_after_alter", "laptop",  # dev.json:452-454
         "ALTER TABLE customers ADD COLUMN loyalty_points INTEGER",
         validation_sql="DESCRIBE customers"),
    # struct / list / json (dev.json:436,468,476,484,508,540)
    Case("list_index", "laptop_array",
         "SELECT phone_numbers[1] AS first_phone FROM customers "
         "WHERE phone_numbers IS NOT NULL"),
    Case("list_slice", "laptop_array",
         "SELECT phone_numbers[:2] AS first_two FROM customers "
         "WHERE phone_numbers IS NOT NULL"),
    Case("struct_field", "laptop_struct",  # dev.json:508
         "SELECT person.name AS name, person.id AS id FROM test"),
    Case("struct_literal_select", "laptop",  # dev.json:476
         "SELECT {'a': 1, 'b': 2, 'c': 3} AS s"),
    Case("list_literal_select", "laptop",  # dev.json:484
         "SELECT [1, 2, 3] AS l"),
    Case("json_arrow_extract", "laptop_json",  # dev.json:540
         "SELECT email->>'from' AS sender FROM customers_json ORDER BY customer_id"),
    # introspection / session (dev.json:188,220,244,252,260,564-574)
    Case("pragma_table_info", "laptop",
         "PRAGMA table_info('products')",
         validation_sql="SELECT name, type FROM ddb_benchmark_result"),
    Case("set_threads_current_setting", "laptop",
         "SET threads = 10",
         validation_sql="SELECT current_setting('threads') AS threads"),
    Case("set_memory_limit", "laptop",
         "SET memory_limit = '20G'",
         validation_sql="SELECT current_setting('memory_limit') AS memory_limit"),
    # COPY round-trips (dev.json:204,324-372) — {tmp} replaced per run
    Case("copy_to_csv_and_back", "laptop",
         "COPY customers TO '{tmp}/customers_export.csv'",
         validation_sql="SELECT count(*) AS n FROM '{tmp}/customers_export.csv'"),
    Case("sample_reservoir_exact_count", "laptop",  # dev.json:556-558
         "SELECT * FROM laptops USING SAMPLE 50% (reservoir)",
         validation_sql="SELECT count(*) AS n FROM ddb_benchmark_result"),
    Case("sample_rows_exact_count", "laptop",
         "SELECT * FROM pcs USING SAMPLE 4 ROWS",
         validation_sql="SELECT count(*) AS n FROM ddb_benchmark_result"),
    Case("group_by_all_exclude_combo", "laptop",  # dev.json:580
         "SELECT * EXCLUDE (quantity, paid, day), sum(paid) AS total "
         "FROM sales GROUP BY ALL ORDER BY ALL"),
    Case("copy_query_to_parquet", "laptop",  # dev.json:204
         "COPY (SELECT model, price FROM laptops WHERE price > 1000) "
         "TO '{tmp}/expensive.parquet' (FORMAT 'parquet')",
         validation_sql="SELECT * FROM '{tmp}/expensive.parquet' ORDER BY model"),
]


EXTRA_CASES = [
    Case("in_list_between", "laptop",  # predicate shapes
         "SELECT model FROM pcs WHERE speed BETWEEN 2.0 AND 3.0 "
         "AND ram IN (512, 1024) ORDER BY model"),
    Case("case_with_null", "laptop",
         "SELECT customer_id, CASE WHEN email IS NULL THEN 'missing' "
         "ELSE substring(email, 1, 3) END AS e3 FROM customers ORDER BY customer_id"),
    Case("order_by_with_nulls", "laptop",  # default NULLS LAST both engines
         "SELECT customer_id, address FROM customers ORDER BY address, customer_id"),
    Case("copy_tab_delimited", "laptop",  # dev.json:333
         "COPY customers TO '{tmp}/tabbed.csv' (DELIMITER '\\t', HEADER)",
         validation_sql="SELECT count(*) AS n FROM read_csv_auto('{tmp}/tabbed.csv', delim='\\t')"),
    Case("json_export_import", "laptop",  # dev.json:356-357
         "COPY (SELECT model, price FROM laptops WHERE price > 2000) TO '{tmp}/l.json'",
         validation_sql="SELECT * FROM read_json_auto('{tmp}/l.json') ORDER BY model"),
    Case("strftime_format", "laptop",
         "SELECT model, strftime(day, '%Y/%m/%d') AS ymd, "
         "strftime(day, '%d %b %Y') AS pretty FROM sales ORDER BY model"),
    Case("escape_string_literal", "laptop",
         r"SELECT E'a\tb' AS tabbed, length(E'x\ny') AS len3"),
]

LAPTOP_CASES.extend(EXTRA_CASES)

PIVOT_CASES = [
    Case("pivot_on_type", "laptop",
         "PIVOT products ON type USING count(*) GROUP BY maker",
         validation_sql="SELECT maker, laptop, pc, printer FROM ddb_benchmark_result"),
    Case("unpivot_laptops", "laptop",
         "UNPIVOT laptops ON speed, screen INTO NAME metric VALUE val",
         validation_sql="SELECT model, metric, val FROM ddb_benchmark_result"),
]

LAPTOP_CASES.extend(PIVOT_CASES)


def all_cases() -> list[Case]:
    return LAPTOP_CASES
