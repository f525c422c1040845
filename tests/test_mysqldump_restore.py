"""End-to-end mysqldump restore: replay a realistic dump script —
conditional /*!…*/ comments, SET header/footer pairs, LOCK TABLES,
DISABLE/ENABLE KEYS, table-options tails, charset introducers, a view
with ALGORITHM/DEFINER attributes — through the engine's multi-
statement front door, then verify the restored state. This is the
canonical "switch a MySQL app onto the engine" workflow (reference
accepts the same scripts through its MySQL wire path)."""

from __future__ import annotations

import pytest

from myduckserver_spark.engine import Engine

DUMP = r"""
-- MySQL dump 10.13  Distrib 8.0.30, for Linux (x86_64)
--
-- Host: localhost    Database: shop
-- ------------------------------------------------------
-- Server version	8.0.30

/*!40101 SET @OLD_CHARACTER_SET_CLIENT=@@CHARACTER_SET_CLIENT */;
/*!40101 SET @OLD_CHARACTER_SET_RESULTS=@@CHARACTER_SET_RESULTS */;
/*!40101 SET NAMES utf8mb4 */;
/*!40103 SET @OLD_TIME_ZONE=@@TIME_ZONE */;
/*!40103 SET TIME_ZONE='+00:00' */;
/*!40014 SET @OLD_UNIQUE_CHECKS=@@UNIQUE_CHECKS, UNIQUE_CHECKS=0 */;
/*!40014 SET @OLD_FOREIGN_KEY_CHECKS=@@FOREIGN_KEY_CHECKS, FOREIGN_KEY_CHECKS=0 */;
/*!40101 SET @OLD_SQL_MODE=@@SQL_MODE, SQL_MODE='NO_AUTO_VALUE_ON_ZERO' */;

--
-- Table structure for table `customers`
--

DROP TABLE IF EXISTS `customers`;
/*!40101 SET @saved_cs_client     = @@character_set_client */;
/*!50503 SET character_set_client = utf8mb4 */;
CREATE TABLE `customers` (
  `id` int NOT NULL AUTO_INCREMENT,
  `name` varchar(100) CHARACTER SET utf8mb4 COLLATE utf8mb4_0900_ai_ci NOT NULL,
  `city` varchar(50) DEFAULT NULL,
  `note` text COMMENT 'free text',
  PRIMARY KEY (`id`),
  UNIQUE KEY `uq_name` (`name`),
  KEY `ix_city` (`city`) USING BTREE
) ENGINE=InnoDB AUTO_INCREMENT=4 DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_0900_ai_ci COMMENT='customer master';
/*!40101 SET character_set_client = @saved_cs_client */;

--
-- Dumping data for table `customers`
--

LOCK TABLES `customers` WRITE;
/*!40000 ALTER TABLE `customers` DISABLE KEYS */;
INSERT INTO `customers` VALUES (1,_utf8mb4'Ada',_utf8mb4'Paris',NULL),(2,N'Bob','Lyon','vip'),(3,'Cyd',NULL,'new');
/*!40000 ALTER TABLE `customers` ENABLE KEYS */;
UNLOCK TABLES;

--
-- Table structure for table `orders`
--

DROP TABLE IF EXISTS `orders`;
CREATE TABLE `orders` (
  `oid` int NOT NULL AUTO_INCREMENT,
  `cust` int NOT NULL,
  `amount` decimal(10,2) NOT NULL DEFAULT '0.00',
  `placed` datetime DEFAULT CURRENT_TIMESTAMP,
  PRIMARY KEY (`oid`),
  KEY `ix_cust` (`cust`)
) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4;

LOCK TABLES `orders` WRITE;
INSERT LOW_PRIORITY INTO `orders` (`oid`, `cust`, `amount`) VALUES (10,1,19.90),(11,1,5.00),(12,2,100.00);
UNLOCK TABLES;

--
-- View `big_spenders`
--

CREATE ALGORITHM=UNDEFINED DEFINER=`root`@`localhost` SQL SECURITY DEFINER VIEW `big_spenders` AS SELECT `cust`, SUM(`amount`) AS `total` FROM `orders` GROUP BY `cust` HAVING SUM(`amount`) > 20;

--
-- Routines, triggers, events, accounts (mysqldump --routines
-- --triggers --events --all-databases shapes; DELIMITER lines are
-- client-side and never reach the server, so they are absent here)
--

CREATE DEFINER=`root`@`localhost` TRIGGER `orders_audit` AFTER INSERT ON `orders` FOR EACH ROW INSERT INTO `order_log` VALUES (NEW.oid, NEW.cust);
CREATE DEFINER=`root`@`localhost` PROCEDURE `cust_orders`(IN c INT)
BEGIN SELECT COUNT(*) AS n FROM orders WHERE cust = c; END;
CREATE DEFINER=`root`@`localhost` FUNCTION `with_fee`(amt DOUBLE) RETURNS DOUBLE DETERMINISTIC RETURN amt + 1.5;
CREATE DEFINER=`root`@`localhost` PROCEDURE `spend_report`(IN lim DOUBLE, OUT big_total DOUBLE)
BEGIN
  DECLARE done INT DEFAULT FALSE;
  DECLARE amt DOUBLE DEFAULT 0;
  DECLARE cur CURSOR FOR SELECT amount FROM orders ORDER BY oid;
  DECLARE CONTINUE HANDLER FOR NOT FOUND SET done = TRUE;
  SET big_total = 0;
  OPEN cur;
  scan_loop: LOOP
    FETCH cur INTO amt;
    IF done THEN LEAVE scan_loop; END IF;
    CASE WHEN amt >= lim THEN SET big_total = big_total + amt;
    ELSE SET big_total = big_total; END CASE;
  END LOOP scan_loop;
  CLOSE cur;
END;
CREATE DEFINER=`root`@`localhost` EVENT `nightly_clean` ON SCHEDULE EVERY 1 DAY DO DELETE FROM order_log WHERE oid < 0;
CREATE USER IF NOT EXISTS 'reporting'@'%' IDENTIFIED WITH 'caching_sha2_password';
GRANT SELECT ON shop.* TO 'reporting'@'%';

CREATE TABLE `order_log` (`oid` int, `cust` int);

/*!40103 SET TIME_ZONE=@OLD_TIME_ZONE */;
/*!40101 SET SQL_MODE=@OLD_SQL_MODE */;
/*!40014 SET FOREIGN_KEY_CHECKS=@OLD_FOREIGN_KEY_CHECKS */;
/*!40014 SET UNIQUE_CHECKS=@OLD_UNIQUE_CHECKS */;
/*!40101 SET CHARACTER_SET_CLIENT=@OLD_CHARACTER_SET_CLIENT */;
/*!40101 SET CHARACTER_SET_RESULTS=@OLD_CHARACTER_SET_RESULTS */;

-- Dump completed on 2024-01-01  0:00:00
"""


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, str(tmp_path / "wh"))


def test_full_dump_replays(eng):
    eng.execute(DUMP)

    rows = {r.id: (r.name, r.city, r.note) for r in
            eng.execute("SELECT id, name, city, note "
                        "FROM customers").collect()}
    assert rows == {
        1: ("Ada", "Paris", None),
        2: ("Bob", "Lyon", "vip"),
        3: ("Cyd", None, "new"),
    }
    meta = eng.table_meta("customers")
    assert meta.stats.get("comment") == "customer master"
    assert meta.stats.get("auto_increment_base") == 4
    assert meta.primary_key == ["id"]

    # AUTO_INCREMENT=4 option continues the counter where the dump
    # left it
    eng.execute("INSERT INTO customers (name) VALUES ('Dee')")
    assert max(
        r.id for r in eng.execute("SELECT id FROM customers").collect()
    ) == 4

    # the restored view works
    spend = {r.cust: float(r.total) for r in
             eng.execute("SELECT cust, total FROM big_spenders").collect()}
    assert spend == {1: 24.9, 2: 100.0}

    # SHOW CREATE TABLE reproduces a loadable definition
    ddl = eng.execute("SHOW CREATE TABLE customers").collect()[0][1]
    assert "AUTO_INCREMENT" in ddl and "PRIMARY KEY" in ddl

    # routines/triggers/events/accounts from the dump are live
    eng.execute("INSERT INTO orders (oid, cust, amount) VALUES (13, 3, 7.5)")
    assert [tuple(r) for r in eng.execute(
        "SELECT * FROM order_log"
    ).collect()] == [(13, 3)]
    assert eng.execute("CALL cust_orders(1)").collect()[0].n == 2
    # round-6 routine surface straight from a dump: cursor read_loop
    # with a NOT FOUND handler and a CASE statement inside the loop
    eng.execute("CALL spend_report(10.0, @bt)")
    assert float(eng.execute("SELECT @bt AS t").collect()[0].t) == 119.9
    assert eng.execute(
        "SELECT with_fee(10.0) AS f"
    ).collect()[0].f == 11.5
    assert [r.Name for r in eng.execute("SHOW EVENTS").collect()] == \
        ["nightly_clean"]
    eng.run_event("nightly_clean")  # host-fired; no rows match
    grants = [r[0] for r in eng.execute(
        "SHOW GRANTS FOR 'reporting'@'%'"
    ).collect()]
    assert any("GRANT SELECT ON shop.*" in g for g in grants)


def test_dump_restore_roundtrip_via_show_create(eng):
    eng.execute(DUMP)
    ddl = eng.execute("SHOW CREATE TABLE orders").collect()[0][1]
    # replaying the engine's own SHOW CREATE TABLE output must work
    eng.execute("DROP TABLE orders")
    eng.execute(ddl)
    assert eng.execute(
        "SELECT COUNT(*) AS n FROM orders"
    ).collect()[0].n == 0
