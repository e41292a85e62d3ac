"""Minimal pure-Python Lua interpreter powering the procedural
flex-config path (reference: the flex backend embeds a real Lua VM and
runs the user's config per OSM object, src/output-flex.cpp:900-1000).

`interp` is the language engine (lexer/parser/evaluator + stdlib
subset); `osm2pgsql_spark.plans.lua_flex` bridges it to the flex DSL's
mapInPandas callback route.
"""

from osm2pgsql_spark.lua.interp import (  # noqa: F401
    LuaError,
    LuaRuntimeError,
    LuaSyntaxError,
    LuaTable,
    Interpreter,
    lua_tostring,
)
