"""Language-level tests for the minimal Lua interpreter
(osm2pgsql_spark/lua/interp.py) — semantics pinned against real Lua 5.3
behavior (hand-verified): number formatting, scoping/closures, multiple
returns, metatables, the stdlib subset, and Lua patterns."""

import pytest

from osm2pgsql_spark.lua.interp import (
    Interpreter,
    LuaRuntimeError,
    LuaSyntaxError,
    LuaTable,
    lua_tostring,
)


def run_expr(src):
    """Evaluate `return <src>` in a fresh interpreter; multi-returns
    come back as a list."""
    it = Interpreter()
    out = {}

    def capture(*vals):
        out["v"] = list(vals)

    it.globals.set("capture", capture)
    it.run(f"capture({src})")
    v = out["v"]
    return v[0] if len(v) == 1 else v


def run(src, result_global="r"):
    it = Interpreter()
    it.run(src)
    return it.globals.get(result_global)


class TestValuesAndOperators:
    def test_integer_float_distinction(self):
        assert run_expr("1 + 2") == 3
        assert isinstance(run_expr("1 + 2"), int)
        assert run_expr("7 / 2") == 3.5          # / is float division
        assert run_expr("7 // 2") == 3
        assert isinstance(run_expr("7 // 2"), int)
        assert run_expr("7 % 3") == 1
        assert run_expr("-7 % 3") == 2            # Lua mod sign
        assert run_expr("2 ^ 10") == 1024.0
        assert isinstance(run_expr("2 ^ 2"), float)

    def test_tostring_formats(self):
        assert lua_tostring(1) == "1"
        assert lua_tostring(1.0) == "1.0"         # 5.3 float marker
        assert lua_tostring(1.5) == "1.5"
        assert lua_tostring(None) == "nil"
        assert lua_tostring(True) == "true"
        assert run_expr("tostring(10/2)") == "5.0"
        assert run_expr("tostring(1e20)") == "1e+20"

    def test_string_number_coercion(self):
        assert run_expr("'10' + 5") == 15
        assert run_expr("10 .. ''") == "10"
        assert run_expr("1.5 .. 'x'") == "1.5x"
        assert run_expr("tonumber(' 42 ')") == 42
        assert run_expr("tonumber('0x1F')") == 31
        assert run_expr("tonumber('abc')") is None
        assert run_expr("tonumber('10', 2)") == 2

    def test_short_circuit_returns_operands(self):
        assert run_expr("nil or 'dflt'") == "dflt"
        assert run_expr("false and error('never')") is False
        assert run_expr("1 and 2") == 2
        assert run_expr("nil and 2") is None
        assert run_expr("not nil") is True

    def test_comparison_errors_on_mixed(self):
        with pytest.raises(LuaRuntimeError):
            run_expr("1 < 'x'")

    def test_length(self):
        assert run_expr("#'hello'") == 5
        assert run_expr("#({10, 20, 30})") == 3


class TestStatements:
    def test_scoping_and_closures(self):
        src = """
        local function counter()
            local n = 0
            return function() n = n + 1 return n end
        end
        local c = counter()
        c(); c()
        r = c()
        """
        assert run(src) == 3

    def test_multiple_assignment_and_returns(self):
        assert run("local a, b = (function() return 1, 2 end)() r = a + b") == 3
        assert run("local a, b, c = 1, 2 r = tostring(c)") == "nil"
        # parenthesized call truncates to one value
        assert run("local a, b = ((function() return 1, 2 end)()) r = tostring(b)") == "nil"

    def test_if_elseif_else(self):
        src = """
        local function f(x)
            if x == 1 then return 'one'
            elseif x == 2 then return 'two'
            else return 'many' end
        end
        r = f(1) .. f(2) .. f(3)
        """
        assert run(src) == "onetwomany"

    def test_numeric_for(self):
        assert run("r = 0 for i = 1, 10 do r = r + i end") == 55
        assert run("r = 0 for i = 10, 1, -2 do r = r + i end") == 30
        assert run("r = 0 for i = 1, 0 do r = r + 1 end") == 0

    def test_while_repeat_break(self):
        assert run("r = 0 while r < 5 do r = r + 1 end") == 5
        assert run("r = 0 repeat r = r + 1 until r >= 3") == 3
        assert run("r = 0 while true do r = r + 1 if r == 4 then break end end") == 4

    def test_repeat_sees_body_locals(self):
        assert run("r = 0 repeat local done = r > 2 r = r + 1 until done") == 4

    def test_generic_for_pairs_ipairs(self):
        assert run("r = 0 for i, v in ipairs({5, 6, 7}) do r = r + i * v end") == 38
        src = """
        local t = {a = 1, b = 2, c = 3}
        r = 0
        for k, v in pairs(t) do r = r + v end
        """
        assert run(src) == 6

    def test_pairs_delete_current_key(self):
        # places.lua deletes the current key inside its pairs loop
        src = """
        local t = {x = 1, y = 2, z = 3}
        r = 0
        for k, v in pairs(t) do
            r = r + v
            t[k] = nil
        end
        r2 = next(t) == nil
        """
        it = Interpreter()
        it.run(src)
        assert it.globals.get("r") == 6
        assert it.globals.get("r2") is True

    def test_method_definition_sugar(self):
        src = """
        local obj = {n = 10}
        function obj:get() return self.n end
        r = obj:get()
        """
        assert run(src) == 10

    def test_goto_rejected(self):
        with pytest.raises(LuaSyntaxError):
            run("goto done ::done::")


class TestTables:
    def test_constructor_forms(self):
        src = """
        local t = {1, 2, x = 'y', [10] = 'ten', 3}
        r = t[1] + t[2] + t[3]
        r2 = t.x
        r3 = t[10]
        """
        it = Interpreter()
        it.run(src)
        assert it.globals.get("r") == 6
        assert it.globals.get("r2") == "y"
        assert it.globals.get("r3") == "ten"

    def test_last_call_expands(self):
        src = """
        local function two() return 8, 9 end
        local t = {two()}
        r = #t
        """
        assert run(src) == 2

    def test_float_key_normalization(self):
        assert run("local t = {} t[1.0] = 'x' r = t[1]") == "x"

    def test_nil_value_deletes(self):
        assert run("local t = {a = 1} t.a = nil r = t.a == nil") is True

    def test_table_insert_remove_concat_sort(self):
        src = """
        local t = {}
        table.insert(t, 'b')
        table.insert(t, 'c')
        table.insert(t, 1, 'a')
        table.remove(t, 2)
        r = table.concat(t, ',')
        """
        assert run(src) == "a,c"
        assert run("local t = {3, 1, 2} table.sort(t) r = table.concat(t, '')") == "123"
        assert run(
            "local t = {1, 3, 2} table.sort(t, function(a, b) return a > b end) "
            "r = table.concat(t, '')"
        ) == "321"
        assert run("local t = {1, 2, 3} r = table.concat(t, ',')") == "1,2,3"

    def test_border_length_semantics(self):
        assert run("local t = {1, 2, 3} t[5] = 9 r = #t") == 3


class TestMetatables:
    def test_index_table(self):
        src = """
        local base = {greet = 'hi'}
        local t = setmetatable({}, {__index = base})
        r = t.greet
        """
        assert run(src) == "hi"

    def test_index_function_default(self):
        # the make_check_values_func pattern from init.lua
        src = """
        local t = setmetatable({}, {__index = function() return 'dflt' end})
        t.known = 'v'
        r = t.known .. t.unknown
        """
        assert run(src) == "vdflt"

    def test_rawget_bypasses(self):
        src = """
        local t = setmetatable({}, {__index = function() return 'x' end})
        r = rawget(t, 'k') == nil
        """
        assert run(src) is True


class TestStdlib:
    def test_string_sub_negative(self):
        assert run_expr("('hello'):sub(2, 3)") == "el"
        assert run_expr("('hello'):sub(-3)") == "llo"
        assert run_expr("('name:en'):sub(6, -1)") == "en"
        assert run_expr("('suffix'):sub(-20)") == "suffix"

    def test_string_basic(self):
        assert run_expr("string.upper('abc')") == "ABC"
        assert run_expr("('AbC'):lower()") == "abc"
        assert run_expr("string.rep('ab', 3)") == "ababab"
        assert run_expr("string.len('xyz')") == 3
        assert run_expr("('x'):byte()") == 120
        assert run_expr("string.char(104, 105)") == "hi"
        assert run_expr("('abc'):reverse()") == "cba"

    def test_string_format(self):
        assert run_expr("string.format('%d-%s', 42, 'x')") == "42-x"
        assert run_expr("string.format('%05.1f', 3.14)") == "003.1"
        assert run_expr("string.format('%x', 255)") == "ff"
        assert run_expr("string.format('%g', 0.5)") == "0.5"
        assert run_expr("string.format('100%%')") == "100%"

    def test_math(self):
        assert run_expr("math.floor(3.7)") == 3
        assert isinstance(run_expr("math.floor(3.7)"), int)
        assert run_expr("math.ceil(3.2)") == 4
        assert run_expr("math.max(1, 5, 3)") == 5
        assert run_expr("math.min(2, -1)") == -1
        assert run_expr("math.huge > 1e300") is True
        assert run_expr("math.abs(-2)") == 2

    def test_select_and_varargs(self):
        src = """
        local function count(...) return select('#', ...) end
        local function second(...) return (select(2, ...)) end
        r = count(7, 8, 9) * 10 + second('a', 'b', 'c'):byte() - ('b'):byte()
        """
        assert run(src) == 30

    def test_pcall_and_error(self):
        src = """
        local ok, err = pcall(function() error('boom') end)
        r = tostring(ok) .. ':' .. err
        """
        assert run(src) == "false:boom"
        assert run("local ok, v = pcall(function() return 5 end) r = v") == 5

    def test_os_date_utc(self):
        # attributes.lua: os.date('!%Y-%m-%dT%H:%M:%SZ', ts)
        assert run_expr(
            "os.date('!%Y-%m-%dT%H:%M:%SZ', 1364479315)"
        ) == "2013-03-28T14:01:55Z"

    def test_require_returns_stdlib(self):
        assert run("local m = require('math') r = m.floor(2.9)") == 2


class TestPatterns:
    def test_find(self):
        assert run_expr("('hello world'):find('wor')") == [7, 9]
        assert run_expr("('hello'):find('xyz')") is None
        assert run_expr("('a.b'):find('.', 1, true)") == [2, 2]
        assert run_expr("('abc123'):find('%d+')") == [4, 6]

    def test_match_captures(self):
        assert run_expr("('key=value'):match('(%w+)=(%w+)')") == ["key", "value"]
        assert run_expr("('  x  '):match('^%s*(.-)%s*$')") == "x"
        # split_unit's pattern from init.lua
        assert run_expr(
            "string.match('3.5 m', '^(-?[0-9.]+) ?(%a*)$')"
        ) == ["3.5", "m"]
        assert run_expr("string.match('x', '^(-?[0-9.]+) ?(%a*)$')") is None

    def test_position_capture(self):
        # osm2pgsql.trim's pattern pair from init.lua
        assert run_expr("('  ab'):match('^%s*()')") == 3
        src = """
        local function trim(str)
            local from = str:match("^%s*()")
            return from > #str and "" or str:match(".*%S", from)
        end
        r = '[' .. trim('  hi there  ') .. trim('   ') .. ']'
        """
        assert run(src) == "[hi there]"

    def test_gmatch(self):
        src = """
        r = {}
        for w in string.gmatch('a; b;c', '([^;]+)') do
            table.insert(r, (w:gsub(' ', '')))
        end
        r = table.concat(r, '|')
        """
        assert run(src) == "a|b|c"

    def test_gsub(self):
        assert run_expr("('hello'):gsub('l', 'L')") == ["heLLo", 2]
        assert run_expr("('hello'):gsub('l', 'L', 1)") == ["heLlo", 1]
        assert run_expr("('a-b'):gsub('%-', '_')") == ["a_b", 1]
        assert run_expr("('x=1,y=2'):gsub('(%w+)=(%w+)', '%2:%1')") == [
            "1:x,2:y", 2]
        src = "r = ('abc'):gsub('%w', function(c) return c:upper() end)"
        assert run(src) == "ABC"

    def test_anchored(self):
        assert run_expr("('abc'):match('^a')") == "a"
        assert run_expr("('abc'):match('^b')") is None
        assert run_expr("('abc'):find('^b', 2)") == [2, 2]
        assert run_expr("('aaa'):gsub('^a', 'X')") == ["Xaa", 1]

    def test_classes(self):
        assert run_expr("('a1 B!'):gsub('%a', 'x')") == ["x1 x!", 2]
        assert run_expr("('a1 B!'):gsub('%A', 'x')") == ["axxBx", 3]
        assert run_expr("('fe80'):match('^%x+$')") == "fe80"
        assert run_expr("('no'):match('^%x+$')") is None
        assert run_expr("('a,b'):match('%p')") == ","

    def test_charset_ranges(self):
        assert run_expr("('street_42'):match('^[a-z_]+')") == "street_"
        assert run_expr("('ABC'):match('[^a-z]+')") == "ABC"
        assert run_expr("('a-b'):match('[a%-b]+')") == "a-b"


class TestInitLuaHelpers:
    """The reference's init.lua helper semantics, re-implemented by the
    bridge — these test the underlying language features they need."""

    def test_has_prefix_shape(self):
        src = """
        local function has_prefix(str, prefix)
            if str == nil then return nil end
            return str:sub(1, prefix:len()) == prefix
        end
        r = has_prefix('name:en', 'name:')
        r2 = has_prefix('name', 'name:')
        """
        it = Interpreter()
        it.run(src)
        assert it.globals.get("r") is True
        assert it.globals.get("r2") is False

    def test_check_values_func_shape(self):
        src = """
        local function make_check_values_func(list, default)
            local valid_values = {}
            if default ~= nil then
                local mt = {__index = function () return default end}
                setmetatable(valid_values, mt)
            end
            for _, elem in ipairs(list) do
                valid_values[elem] = elem
            end
            return function(value) return valid_values[value] end
        end
        local f = make_check_values_func({'a', 'b'}, 'other')
        r = f('a') .. f('zz')
        """
        assert run(src) == "aother"

    def test_w2r_accumulation_shape(self):
        # the route-relations.lua inner-table idiom
        src = """
        local w2r = {}
        local function add(way_id, rel_id, ref)
            if not w2r[way_id] then w2r[way_id] = {} end
            w2r[way_id][rel_id] = ref
        end
        add(10, 100, 'A1')
        add(10, 101, 'B2')
        add(11, 100, 'A1')
        local refs = {}
        for rel_id, rel_ref in pairs(w2r[10]) do
            refs[#refs + 1] = rel_ref
        end
        table.sort(refs)
        r = table.concat(refs, ',')
        """
        assert run(src) == "A1,B2"


class TestAdvicePins:
    """Round-7 ADVICE regressions: pcall must trap builtin
    argument-type errors as Lua errors (never a raw Python traceback
    escaping the mapInPandas task), and tonumber must reject
    'inf'/'nan' strings like Lua 5.3."""

    def test_pcall_traps_builtin_bad_argument(self):
        ok, msg = run_expr("pcall(function() return string.len(nil) end)")
        assert ok is False
        assert "bad argument" in msg

    def test_pcall_traps_direct_builtin_call(self):
        ok, msg = run_expr("pcall(string.rep, nil, 3)")
        assert ok is False
        assert isinstance(msg, str)

    def test_tonumber_rejects_inf_nan_strings(self):
        assert run_expr("tonumber('inf')") is None
        assert run_expr("tonumber('infinity')") is None
        assert run_expr("tonumber('nan')") is None
        assert run_expr("tonumber('-inf')") is None
        assert run_expr("tonumber('1e3')") == 1000.0
        assert run_expr("tonumber('0x1A')") == 26
        assert run_expr("tonumber('  -4.5  ')") == -4.5

    def test_arithmetic_on_inf_string_raises(self):
        with pytest.raises(LuaRuntimeError, match="arithmetic"):
            run("r = 'inf' + 1")
