BEGIN;
CREATE TABLE "planet_osm_point" ("osm_id" int8, "name" text, "tags" jsonb, "way" geometry(Point,3857));
COMMIT;
BEGIN;
CREATE TABLE "planet_osm_line" ("osm_id" int8, "highway" text, "z_order" int4, "way" geometry(LineString,3857));
COMMIT;
COPY "planet_osm_point" ("osm_id", "name", "tags", "way") FROM STDIN;
1	A pub	{"amenity":"pub"}	\N
10	stop\twith\ttabs	\N	\N
11	line\nbreak	{"k":"v"}	\N
\.
COPY "planet_osm_line" ("osm_id", "highway", "z_order", "way") FROM STDIN;
100	residential	330	\N
101	\N	0	\N
\.
CREATE INDEX ON "planet_osm_point" USING gist ("way");
ANALYZE "planet_osm_point";
CREATE INDEX ON "planet_osm_line" USING gist ("way");
CREATE INDEX ON "planet_osm_line" USING btree ("osm_id") WITH (fillfactor = 90);
ANALYZE "planet_osm_line";
-- append batch (delete_batch_max=2 forces mid-stream delete flushes)
DELETE FROM planet_osm_point WHERE osm_id IN (1,2,3);
DELETE FROM planet_osm_point WHERE osm_id IN (4,5);
INSERT INTO planet_osm_point (osm_id, name) VALUES (1,'A pub renamed');
INSERT INTO planet_osm_point (osm_id, name) VALUES (2,'new');
INSERT INTO planet_osm_point (osm_id, name) VALUES (4,'it''s quoted');
INSERT INTO planet_osm_point (osm_id, name) VALUES (5,'five');
COMMIT;
