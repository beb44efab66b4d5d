"""Benchmark-style fixture databases, seeded through BOTH engines with the
same DDL/INSERT statements.

Schemas and data characteristics follow FIXTURES.md (extracted from the
reference's 12 benchmark databases, /root/reference/eval/data/tables.json):
laptop (customers/laptops/pcs/printers/products/sales, NULLs in
address/email, apostrophes in names, 'TRUE'/'FALSE' string colors,
'%visa%'-matchable payment types), laptop_array (phone_numbers VARCHAR[]),
laptop_struct (person STRUCT), laptop_json (JSON email), transactions
(HAVING balance = 0 case), hn (urls with NULLs + emails in text).

Seeding both engines from the same statement list is itself a test: every
CREATE/INSERT runs through the engine's DDL/DML router AND DuckDB.
"""

LAPTOP = [
    """CREATE TABLE customers (
        customer_id VARCHAR, firstname VARCHAR, lastname VARCHAR,
        city VARCHAR, address VARCHAR, email VARCHAR)""",
    """INSERT INTO customers VALUES
        ('1', 'Maria', 'Smith', 'Amsterdam', 'Kerkstraat 1', 'maria@example.com'),
        ('2', 'Ann', 'O''Brien', 'Rotterdam', NULL, 'ann.obrien@mail.org'),
        ('3', 'Jorge', 'Castillo', 'Amsterdam', 'Damrak 5', NULL),
        ('4', 'Pavel', 'Toledo', 'Utrecht', 'Oudegracht 20', 'pavel@toledo.com'),
        ('5', 'Elena', 'Marin', 'Rotterdam', NULL, 'test1234@elena.net')""",
    """CREATE TABLE laptops (
        model VARCHAR, speed DOUBLE, ram INTEGER, hd INTEGER,
        screen DOUBLE, price DOUBLE)""",
    """INSERT INTO laptops VALUES
        ('2001', 2.00, 2048, 240, 20.1, 3673.0),
        ('2002', 1.73, 1024, 80, 17.0, 949.0),
        ('2003', 1.80, 512, 60, 15.4, 549.0),
        ('2004', 2.00, 512, 60, 13.3, 1150.0),
        ('2005', 2.16, 1024, 120, 17.0, 2500.0),
        ('2006', 2.00, 2048, 80, 15.4, 1700.0),
        ('2007', 1.83, 1024, 120, 13.3, 1429.0),
        ('2008', 1.60, 1024, 100, 15.4, 900.0),
        ('2009', 1.60, 512, 80, 14.1, 680.0),
        ('2010', 2.00, 2048, 160, 15.4, 2300.0)""",
    """CREATE TABLE pcs (
        model VARCHAR, speed DOUBLE, ram INTEGER, hd INTEGER, price DOUBLE)""",
    """INSERT INTO pcs VALUES
        ('1001', 2.66, 1024, 250, 2114.0),
        ('1002', 2.10, 512, 250, 995.0),
        ('1003', 1.42, 512, 80, 478.0),
        ('1004', 2.80, 1024, 250, 649.0),
        ('1005', 3.20, 512, 250, 630.0),
        ('1006', 3.20, 1024, 320, 1049.0),
        ('1007', 2.20, 1024, 200, 510.0),
        ('1008', 2.20, 2048, 250, 770.0),
        ('1009', 2.00, 1024, 250, 650.0),
        ('1010', 2.80, 2048, 300, 770.0),
        ('1011', 1.86, 2048, 160, 959.0),
        ('1012', 2.80, 1024, 160, 649.0),
        ('1013', 3.06, 512, 80, 529.0)""",
    """CREATE TABLE printers (
        model VARCHAR, color VARCHAR, type VARCHAR, price DOUBLE)""",
    """INSERT INTO printers VALUES
        ('3001', 'TRUE', 'ink-jet', 99.0),
        ('3002', 'FALSE', 'laser', 239.0),
        ('3003', 'TRUE', 'laser', 899.0),
        ('3004', 'TRUE', 'ink-jet', 120.0),
        ('3005', 'FALSE', 'laser', 120.0),
        ('3006', 'TRUE', 'ink-jet', 100.0),
        ('3007', 'TRUE', 'laser', 200.0)""",
    """CREATE TABLE products (maker VARCHAR, model VARCHAR, type VARCHAR)""",
    """INSERT INTO products VALUES
        ('A', '1001', 'pc'), ('A', '1002', 'pc'), ('A', '1003', 'pc'),
        ('A', '2004', 'laptop'), ('A', '2005', 'laptop'), ('A', '2006', 'laptop'),
        ('B', '1004', 'pc'), ('B', '1005', 'pc'), ('B', '1006', 'pc'),
        ('B', '2001', 'laptop'), ('B', '2002', 'laptop'),
        ('C', '1007', 'pc'), ('C', '2003', 'laptop'), ('C', '3001', 'printer'),
        ('C', '3002', 'printer'), ('C', '3003', 'printer'),
        ('D', '1008', 'pc'), ('D', '1009', 'pc'), ('D', '1010', 'pc'),
        ('D', '1011', 'pc'), ('D', '2007', 'laptop'), ('D', '2008', 'laptop'),
        ('D', '3004', 'printer'), ('D', '3005', 'printer'),
        ('E', '1012', 'pc'), ('E', '1013', 'pc'), ('E', '2009', 'laptop'),
        ('E', '2010', 'laptop'), ('E', '3006', 'printer'), ('E', '3007', 'printer')""",
    """CREATE TABLE sales (
        customer_id VARCHAR, model VARCHAR, quantity INTEGER,
        day DATE, paid DOUBLE, type_of_payment VARCHAR)""",
    """INSERT INTO sales VALUES
        ('1', '1001', 1, DATE '2023-12-10', 2114.0, 'visa credit'),
        ('1', '3002', 2, DATE '2023-12-11', 478.0, 'mastercard credit'),
        ('2', '2001', 1, DATE '2023-12-12', 3673.0, 'visa debit'),
        ('2', '1005', 1, DATE '2023-12-12', 630.0, 'cash'),
        ('3', '2003', 1, DATE '2023-12-13', 549.0, 'mastercard debit'),
        ('3', '3003', 1, DATE '2023-12-14', 899.0, 'visa credit'),
        ('4', '1010', 2, DATE '2023-12-15', 1540.0, 'cash'),
        ('4', '2010', 1, DATE '2023-12-16', 2300.0, 'visa credit'),
        ('5', '3007', 3, DATE '2023-12-17', 600.0, 'mastercard credit'),
        ('5', '1013', 1, DATE '2023-12-18', 529.0, 'cash')""",
]

LAPTOP_ARRAY = LAPTOP + [
    "ALTER TABLE customers ADD COLUMN phone_numbers VARCHAR[]",
    """INSERT INTO customers VALUES
        ('6', 'Noor', 'Hassan', 'Den Haag', 'Laan 3', 'noor@x.io',
         ['0612345678', '0698765432'])""",
]

LAPTOP_STRUCT = LAPTOP + [
    "CREATE TABLE test (person STRUCT(name VARCHAR, id INTEGER))",
    "INSERT INTO test VALUES ({'name': 'Oliver', 'id': 12})",
]

LAPTOP_JSON = LAPTOP + [
    "CREATE TABLE customers_json (customer_id VARCHAR, email VARCHAR)",
    """INSERT INTO customers_json VALUES
        ('1', '{"from": "maria@example.com", "to": "shop@example.com"}'),
        ('2', '{"from": "ann@mail.org", "to": "shop@example.com"}')""",
]

TRANSACTIONS = [
    "CREATE TABLE users (id INTEGER, name VARCHAR)",
    "INSERT INTO users VALUES (1, 'alice'), (2, 'bob')",
    "CREATE TABLE transactions (user_id INTEGER, amount INTEGER)",
    "INSERT INTO transactions VALUES (1, 10), (2, -5), (1, 15), (2, 3)",
]

HN = [
    """CREATE TABLE hacker_news (
        title VARCHAR, url VARCHAR, text VARCHAR, score INTEGER, by VARCHAR)""",
    """INSERT INTO hacker_news VALUES
        ('Show HN: engine', 'https://news.ycombinator.com/item?id=1', 'great stuff', 120, 'pg'),
        ('Ask HN: jobs?', NULL, 'contact test123@example.com for details', 40, 'dang'),
        ('Launch post', 'http://blog.example.org/post/2', 'email me at test9@foo.io', 77, 'sama'),
        ('Plain text', NULL, 'no emails here', 5, 'anon')""",
]

DATABASES = {
    "laptop": LAPTOP,
    "laptop_array": LAPTOP_ARRAY,
    "laptop_struct": LAPTOP_STRUCT,
    "laptop_json": LAPTOP_JSON,
    "transactions": TRANSACTIONS,
    "hn": HN,
}
