"""OSM tag-value vocabularies, transcribed verbatim from the reference SQL.

Every list below mirrors a ``= ANY ('{...}')`` array literal in
``sql/templates/osm_attributes.sql.j2`` (cited per constant).  First-match
semantics of the surrounding CASE expressions are preserved by the builders
in :mod:`netascore_spark.functions.attributes`.
"""

# --- access_car normalization (osm_attributes.sql.j2:32-118) ---------------

CAR_ACCESS_NO = [
    "access=forestry", "agricultural", "blocked", "customers;forestry",
    "discouraged", "foot", "forbidden", "forestral", "forestry",
    "forestry;agricultural", "military", "motor_vehicles=no", "no",
    "no @ (heavy_rain OR flooding OR ice OR snow)", "pr", "private",
    "restricted", "service_vehicles", "site_vehicles", "taxi",
]  # osm_attributes.sql.j2:37-39

MOTOR_VEHICLE_DIR_NO = ["agricultural", "no", "private"]  # :44,:49

ONEWAY_OPPOSITE = ["-1", "1"]  # :55,:61,:67

MOTOR_VEHICLE_NO = [
    "no", "no @ Mo-Fr 07:00-17:00", "permissive;no", "agricultural",
    "agricultural;destination", "agricultural;destination @ (May 1-Jul 15)",
    "agricultural;forestry", "agricultural;forestry;destination",
    "agricultural;private;delivery", "agriculture", "bus_service",
    "forestral", "forestry", "forestry,agricultural", "forestry;agricultural",
    "forestry;agriculture", "forestry;destination", "private",
    "private, residents", "private;agricultural", "private;destination",
    "private;forestry;agriculture", "private1", "psv", "restricted",
]  # :77-83

MOTORCAR_NO = ["no", "agricultural", "private", "forestry"]  # :88

VEHICLE_FORWARD_NO = [
    "agricultural", "agricultural;forestry", "agricultural;private",
    "forestry", "forestry;agricultural", "no", "private",
]  # :93

VEHICLE_BACKWARD_NO = ["agricultural", "forestry", "no", "private"]  # :98

VEHICLE_NO = [
    "agricultural", "agricultural;delivery", "agricultural;destination",
    "agricultural;forestry", "agricultural;forestry;destination",
    "agricultural;permissive", "agricultural;private", "bicycle",
    "bicycle;destination", "bus", "delivery;agricultural;forestry",
    "for military", "forestry", "forestry;agricultural", "forestry;delivery",
    "forestry;destination", "forestry;residents", "industry;agricultural",
    "military", "n+", "no", "no @ (Mo-Fr 07:00-17:00)",
    "no @ Mo-Fr 07:00-17:00", "private", "private;agricultural",
    "private;delivery", "private;delivery;disabled", "residents;forestry",
    "restricted", "wheelchair;taxi",
]  # :103-109

CAR_HIGHWAY_NO = [
    "bridleway", "cycleway", "footway", "path", "pedestrian", "platform",
    "steps",
]  # :114

# --- access_bicycle normalization (osm_attributes.sql.j2:149-220) ----------

BIKE_ACCESS_NO = [
    "blocked", "bus", "foot", "forbidden", "military", "no",
    "no @ (heavy_rain OR flooding OR ice OR snow)", "private", "psv",
    "restricted", "service_vehicles", "site_vehicles", "taxi",
]  # :154-155

BICYCLE_DIR_NO = ["no", "dismount"]  # :160,:165

ONEWAY_BICYCLE_OPPOSITE = ["-1", "opposite"]  # :171

BIKE_ONEWAY_OPPOSITE = ["-1", "1", "opposite"]  # :182

CYCLEWAY_NO = ["no", "proposed"]  # :187
CYCLEWAY_OPPOSITE = [
    "opposite", "opposite_lane", "opposite_share_busway", "opposite_track",
]  # :188

CYCLEWAY_RIGHT_NO = ["no", "none"]  # :193
CYCLEWAY_RIGHT_OPPOSITE = ["opposite_lane"]  # :194

CYCLEWAY_LEFT_NO = ["no", "none"]  # :199
CYCLEWAY_LEFT_OPPOSITE = [
    "opposite", "opposite_lane", "opposite_share_busway", "opposite_track",
]  # :200

BICYCLE_NO = [
    "dismount", "dismount;private", "no", "private", "push",
    "service_vehicles", "supplier", "use_sidepath",
]  # :210

BIKE_HIGHWAY_NO = [
    "bus_guideway", "crossing", "emergency_bay", "escape", "footway",
    "motorway", "motorway_link", "pedestrian", "platform", "steps",
]  # :215-216

# --- access_pedestrian normalization (osm_attributes.sql.j2:251-281) -------

PED_ACCESS_NO = [
    "blocked", "bus", "forbidden", "military", "no",
    "no @ (heavy_rain OR flooding OR ice OR snow)", "private", "psv",
    "restricted", "service_vehicles", "site_vehicles", "taxi",
]  # :256-257

FOOT_NO = [
    "no", "discouraged", "private", "workers", "use_sidepath", "use_sidewalk",
]  # :262

FOOTWAY_NO = ["no"]  # :267

SIDEWALK_NO = ["no", "no u-turn?", "none"]  # :272

PED_HIGHWAY_NO = [
    "bus_guideway", "cycleway", "emergency_bay", "escape", "motorway",
    "motorway_link",
]  # :277

# --- pavement classification (osm_attributes.sql.j2:691-696) ---------------

PAVEMENT_ASPHALT = ["asphalt", "paved", "concrete"]
PAVEMENT_GRAVEL = [
    "compacted", "fine_gravel", "gravel", "paving_stones", "pebblestone",
    "ground;gravel", "unpaved",
]
PAVEMENT_SOFT = ["dirt", "earth", "grass", "ground", "ground;grass", "sand", "wood"]
PAVEMENT_COBBLE = ["cobblestone"]

# --- network source filter (osm_network.sql.j2:40-52) ----------------------

NETWORK_HIGHWAY = [
    "motorway", "trunk", "primary", "secondary", "tertiary", "unclassified",
    "residential", "motorway_link", "trunk_link", "primary_link",
    "secondary_link", "tertiary_link", "living_street", "service",
    "pedestrian", "track", "bus_guideway", "escape", "road", "footway",
    "bridleway", "steps", "path", "cycleway", "construction", "crossing",
    "emergency_bay", "platform",
]

NETWORK_RAILWAY = [
    "construction", "funicular", "light_rail", "monorail", "narrow_gauge",
    "rail", "subway", "tram", "turntable", "traverser",
]

NETWORK_AERIALWAY = [
    "cable_car", "gondola", "mixed_lift", "chair_lift", "drag_lift", "t-bar",
    "j-bar", "platter",
]

# --- designated route network tiers (osm_attributes.sql.j2:523-530) --------

ROUTE_PRIORITY = ["international", "national", "regional", "local", "unknown"]
