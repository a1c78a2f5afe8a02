"""Reference symbol-extraction goldens, ported (reference
tests/unit/indexer/symbols/test_{python,javascript,go,rust}.py) against
the scanner in stages/symbols.py. No Ray needed — pure kernels."""

from coco_search_ray.stages.symbols import (
    extract_symbol_metadata,
    extract_symbols,
    guess_language,
)


# --- python (reference test_python.py) ---------------------------------


def test_py_simple_function():
    r = extract_symbol_metadata("def foo(): pass", "py")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == (
        "function", "foo", "def foo():",
    )


def test_py_function_with_parameters():
    r = extract_symbol_metadata("def bar(x, y=10): pass", "py")
    assert r.symbol_name == "bar"
    assert r.symbol_signature == "def bar(x, y=10):"


def test_py_type_hints():
    r = extract_symbol_metadata("def baz(x: int, y: str = 'default') -> dict:\n    pass", "py")
    assert r.symbol_signature == "def baz(x: int, y: str = 'default') -> dict:"


def test_py_async_function():
    r = extract_symbol_metadata("async def fetch(url: str) -> str:\n    pass", "py")
    assert (r.symbol_type, r.symbol_name) == ("function", "fetch")
    assert r.symbol_signature == "async def fetch(url: str) -> str:"


def test_py_decorated_function():
    r = extract_symbol_metadata("@property\ndef name(self):\n    pass", "py")
    assert (r.symbol_type, r.symbol_name) == ("function", "name")
    assert r.symbol_signature == "def name(self):"


def test_py_multiple_decorators():
    code = "@staticmethod\n@lru_cache(maxsize=128)\ndef compute(x: int) -> int:\n    pass"
    r = extract_symbol_metadata(code, "py")
    assert r.symbol_name == "compute"
    assert "def compute(x: int) -> int:" in r.symbol_signature


def test_py_multiline_signature():
    code = "def configure(\n    host: str,\n    port: int = 8080,\n) -> None:\n    pass"
    r = extract_symbol_metadata(code, "py")
    assert r.symbol_name == "configure"
    assert r.symbol_signature.endswith(") -> None:")


def test_py_classes():
    assert extract_symbol_metadata("class Foo:\n    pass", "py").symbol_signature == "class Foo:"
    r = extract_symbol_metadata("class Bar(Foo):\n    pass", "py")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("class", "Bar", "class Bar(Foo):")
    r = extract_symbol_metadata("class Container(Generic[T], Iterable[T]):\n    pass", "py")
    assert r.symbol_name == "Container" and "Generic[T]" in r.symbol_signature


def test_py_class_first_before_method():
    code = "class Calculator:\n    def add(self, x: int, y: int) -> int:\n        return x + y\n"
    r = extract_symbol_metadata(code, "python")
    assert (r.symbol_type, r.symbol_name) == ("class", "Calculator")
    # the method appears later in the list, class-qualified
    syms = extract_symbols(code, "python")
    assert syms[1]["symbol_name"] == "Calculator.add"
    assert syms[1]["symbol_type"] == "function"


def test_py_decorated_method_keeps_class_first():
    code = "class MyClass:\n    @classmethod\n    def from_dict(cls, data: dict):\n        pass\n"
    r = extract_symbol_metadata(code, "py")
    assert (r.symbol_type, r.symbol_name) == ("class", "MyClass")


def test_py_nested_function_outer_first():
    code = "def outer():\n    def inner():\n        pass\n    return inner\n"
    r = extract_symbol_metadata(code, "py")
    assert (r.symbol_type, r.symbol_name) == ("function", "outer")


def test_py_empty_and_prose():
    assert extract_symbol_metadata("", "py").symbol_type is None
    assert extract_symbol_metadata("x = 1\nprint(x)", "py").symbol_type is None


# --- javascript (reference test_javascript.py) --------------------------


def test_js_simple_function():
    r = extract_symbol_metadata("function fetchUser() { return null; }", "js")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == (
        "function", "fetchUser", "function fetchUser()",
    )


def test_js_function_with_parameters():
    r = extract_symbol_metadata("function add(a, b) { return a + b; }", "js")
    assert r.symbol_signature == "function add(a, b)"


def test_js_arrow_function():
    r = extract_symbol_metadata("const fetchData = (url) => { return fetch(url); }", "js")
    assert (r.symbol_type, r.symbol_name) == ("function", "fetchData")
    assert r.symbol_signature == "const fetchData = (url) =>"
    r = extract_symbol_metadata("const multiply = (x, y) => x * y;", "js")
    assert r.symbol_name == "multiply"


def test_js_class():
    r = extract_symbol_metadata("class UserService { }", "js")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == (
        "class", "UserService", "class UserService",
    )


def test_js_method_qualified():
    code = "class UserService {\n    fetchUser(id) {\n        return this.users[id];\n    }\n}"
    r = extract_symbol_metadata(code, "js")
    assert (r.symbol_type, r.symbol_name) == ("class", "UserService")
    syms = extract_symbols(code, "javascript")
    assert len(syms) == 2
    assert syms[1]["symbol_type"] == "method"
    assert syms[1]["symbol_name"] == "UserService.fetchUser"
    assert "fetchUser(id)" in syms[1]["symbol_signature"]


def test_js_jsx_and_ts():
    assert extract_symbol_metadata("function Button() { return 1; }", "jsx").symbol_name == "Button"
    assert extract_symbol_metadata("function f(x: number): number { return x; }", "ts").symbol_name == "f"


def test_js_no_symbols():
    assert extract_symbol_metadata("const x = 42; console.log(x);", "js").symbol_type is None
    assert extract_symbol_metadata("", "js").symbol_type is None


def test_js_ignores_strings_and_comments():
    code = "// function fake() {}\nconst s = 'function fake2() {'\nfunction real() {}"
    syms = extract_symbols(code, "js")
    assert [s["symbol_name"] for s in syms] == ["real"]


# --- go (reference test_go.py) ------------------------------------------


def test_go_function():
    r = extract_symbol_metadata("func Process() error { return nil }", "go")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == (
        "function", "Process", "func Process() error",
    )


def test_go_pointer_receiver_method():
    r = extract_symbol_metadata("func (s *Server) Start() error { return nil }", "go")
    assert (r.symbol_type, r.symbol_name) == ("method", "Server.Start")
    assert r.symbol_signature == "func (s *Server) Start() error"


def test_go_value_receiver_method():
    r = extract_symbol_metadata("func (c Config) GetPort() int { return c.Port }", "go")
    assert (r.symbol_type, r.symbol_name) == ("method", "Config.GetPort")


def test_go_struct_and_interface():
    r = extract_symbol_metadata("type Server struct { port int; host string }", "go")
    assert (r.symbol_type, r.symbol_name) == ("class", "Server")
    r = extract_symbol_metadata("type Handler interface { Handle() error }", "go")
    assert (r.symbol_type, r.symbol_name) == ("interface", "Handler")


def test_go_no_symbols():
    assert extract_symbol_metadata("package main\nvar x = 1", "go").symbol_type is None


# --- rust (reference test_rust.py) ---------------------------------------


def test_rs_function():
    r = extract_symbol_metadata("fn process() -> Result<(), Error> { Ok(()) }", "rs")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == (
        "function", "process", "fn process() -> Result<(), Error>",
    )


def test_rs_public_function():
    r = extract_symbol_metadata("pub fn new() -> Self { Self {} }", "rs")
    assert (r.symbol_type, r.symbol_name) == ("function", "new")


def test_rs_method_in_impl():
    code = "impl Server {\n    fn start(&self) -> Result<(), Error> {\n        Ok(())\n    }\n}"
    r = extract_symbol_metadata(code, "rs")
    assert (r.symbol_type, r.symbol_name) == ("method", "Server.start")
    assert r.symbol_signature == "fn start(&self) -> Result<(), Error>"


def test_rs_multiple_methods_in_impl():
    code = "impl Server {\n    fn start(&self) {}\n    fn stop(&mut self) {}\n}"
    syms = extract_symbols(code, "rust")
    assert [s["symbol_name"] for s in syms] == ["Server.start", "Server.stop"]


def test_rs_struct_trait_enum():
    r = extract_symbol_metadata("struct Server { port: u16, host: String }", "rs")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("class", "Server", "struct Server")
    assert extract_symbol_metadata("struct Point(i32, i32);", "rs").symbol_name == "Point"
    r = extract_symbol_metadata("trait Handler { fn handle(&self) -> Result<(), Error>; }", "rs")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("interface", "Handler", "trait Handler")
    r = extract_symbol_metadata("enum Status { Active, Inactive, Pending }", "rs")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("class", "Status", "enum Status")
    assert extract_symbol_metadata("enum Message { Quit, Move { x: i32, y: i32 }, Write(String) }", "rs").symbol_name == "Message"


def test_rs_trait_fn_not_captured_as_function():
    # .scm captures top-level fns and impl fns only; trait-body fns are
    # neither — the first symbol is the trait itself
    code = "trait Handler {\n    fn handle(&self) -> u8;\n}"
    syms = extract_symbols(code, "rust")
    assert [s["symbol_type"] for s in syms] == ["interface"]


def test_rs_no_symbols():
    assert extract_symbol_metadata("use std::io::Result;\nmod tests;", "rs").symbol_type is None


# --- shared edges ---------------------------------------------------------


def test_unsupported_language_null_fields():
    r = extract_symbol_metadata("def foo(): pass", "cobol")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == (None, None, None)


def test_signature_truncated_at_200():
    code = "def f(" + ", ".join(f"arg_{i}: int = {i}" for i in range(40)) + "):\n    pass"
    r = extract_symbol_metadata(code, "py")
    assert len(r.symbol_signature) == 200 and r.symbol_signature.endswith("...")


def test_guess_language():
    assert guess_language("def foo(x):") == "py"
    assert guess_language("func (s *S) Run() {") == "go"
    assert guess_language("fn main() {") == "rs"
    assert guess_language("function go() {") == "js"
    assert guess_language("plain prose here") is None


# --- java (reference test_java.py) ---------------------------------------


def test_java_class_interface_enum():
    r = extract_symbol_metadata("class User { }", "java")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("class", "User", "class User")
    r = extract_symbol_metadata("interface Repository { void save(); }", "java")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("interface", "Repository", "interface Repository")
    r = extract_symbol_metadata("enum Status { ACTIVE, INACTIVE, PENDING }", "java")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("class", "Status", "enum Status")


def test_java_method_and_constructor():
    code = "class UserService {\n    public User findById(int id) {\n        return null;\n    }\n}"
    r = extract_symbol_metadata(code, "java")
    assert (r.symbol_type, r.symbol_name) == ("class", "UserService")
    syms = extract_symbols(code, "java")
    assert syms[1]["symbol_type"] == "method"
    assert syms[1]["symbol_name"] == "UserService.findById"
    code = "class User {\n    public User(String name) {\n        this.name = name;\n    }\n}"
    syms = extract_symbols(code, "java")
    assert syms[0]["symbol_name"] == "User"
    assert syms[1]["symbol_name"] == "User.User"  # constructor -> method
    assert syms[1]["symbol_type"] == "method"


def test_java_abstract_declaration_not_method():
    # interface body: save() ends in ';' (no body) -> not captured as a
    # method_declaration body-bearing node
    syms = extract_symbols("interface R { void save(); }", "java")
    assert [s["symbol_type"] for s in syms] == ["interface"]


def test_java_empty():
    assert extract_symbol_metadata("", "java").symbol_type is None


# --- c (reference test_c.py) ----------------------------------------------


def test_c_functions():
    r = extract_symbol_metadata("int process() { return 0; }", "c")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("function", "process", "int process()")
    r = extract_symbol_metadata("int add(int a, int b) { return a + b; }", "c")
    assert r.symbol_name == "add" and "int add(" in r.symbol_signature
    r = extract_symbol_metadata("void *allocate(size_t size) { return malloc(size); }", "c")
    assert (r.symbol_type, r.symbol_name) == ("function", "allocate")


def test_c_declarations_ignored():
    assert extract_symbol_metadata("int process();", "c").symbol_type is None
    assert extract_symbol_metadata("struct User;", "c").symbol_type is None


def test_c_struct_enum_typedef():
    r = extract_symbol_metadata("struct User { char *name; int age; };", "c")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("class", "User", "struct User")
    r = extract_symbol_metadata("enum Status { ACTIVE, INACTIVE, PENDING };", "c")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("class", "Status", "enum Status")
    r = extract_symbol_metadata("typedef struct User User;", "c")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("interface", "User", "typedef struct User User;")


def test_c_header_extension():
    assert extract_symbol_metadata("int process() { return 0; }", "h").symbol_name == "process"


# --- ruby (reference test_ruby.py) -----------------------------------------


def test_rb_class_module():
    r = extract_symbol_metadata("class User\nend", "rb")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("class", "User", "class User")
    r = extract_symbol_metadata("module Authentication\nend", "rb")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("class", "Authentication", "module Authentication")


def test_rb_methods_qualified():
    code = 'class User\n  def save\n    puts "saving"\n  end\nend'
    r = extract_symbol_metadata(code, "rb")
    assert (r.symbol_type, r.symbol_name) == ("class", "User")
    syms = extract_symbols(code, "ruby")
    assert syms[1]["symbol_type"] == "method"
    assert syms[1]["symbol_name"] == "User.save"
    code = "class User\n  def self.find(id)\n    puts id\n  end\nend"
    syms = extract_symbols(code, "rb")
    assert syms[1]["symbol_name"] == "User.find"


def test_rb_empty():
    assert extract_symbol_metadata("", "rb").symbol_type is None


# --- bash (reference test_bash.py) ------------------------------------------


def test_sh_posix_function():
    r = extract_symbol_metadata("my_function() {\n    echo hello\n}", "sh")
    assert (r.symbol_type, r.symbol_name) == ("function", "my_function")


def test_sh_ksh_and_hybrid():
    r = extract_symbol_metadata("function deploy {\n    echo deploying\n}", "bash")
    assert (r.symbol_type, r.symbol_name) == ("function", "deploy")
    r = extract_symbol_metadata("function setup() {\n    echo setup\n}", "zsh")
    assert (r.symbol_type, r.symbol_name) == ("function", "setup")


def test_sh_non_function():
    assert extract_symbol_metadata("echo hello world\nls -la", "sh").symbol_type is None


def test_sh_multiline_body():
    r = extract_symbol_metadata("cleanup() {\n    rm -rf /tmp/build\n    echo done\n}", "sh")
    assert r.symbol_name == "cleanup"


# --- cpp (reference test_cpp.py) --------------------------------------------


def test_cpp_function_and_class():
    r = extract_symbol_metadata("int process() { return 0; }", "cpp")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("function", "process", "int process()")
    r = extract_symbol_metadata("class Server { int port; };", "cpp")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("class", "Server", "class Server")
    r = extract_symbol_metadata("struct Point { int x; int y; };", "cpp")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("class", "Point", "struct Point")


def test_cpp_namespace_and_qualified_method():
    r = extract_symbol_metadata("namespace MyLib { }", "cpp")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("class", "MyLib", "namespace MyLib")
    r = extract_symbol_metadata("void MyClass::myMethod() { }", "cpp")
    assert (r.symbol_type, r.symbol_name) == ("method", "myMethod")
    assert "MyClass::myMethod" in r.symbol_signature


def test_cpp_pointer_and_templates():
    assert extract_symbol_metadata("void *allocate(size_t size) { return new char[size]; }", "cpp").symbol_name == "allocate"
    r = extract_symbol_metadata("template<typename T> class Container { };", "cpp")
    assert (r.symbol_type, r.symbol_name) == ("class", "Container")
    r = extract_symbol_metadata("template<typename T> T max(T a, T b) { return a > b ? a : b; }", "cpp")
    assert (r.symbol_type, r.symbol_name) == ("function", "max")


def test_cpp_extensions_and_empty():
    for ext in ("cpp", "cxx", "cc", "hpp"):
        assert extract_symbol_metadata("class Foo {};", ext).symbol_type == "class"
    assert extract_symbol_metadata("", "cpp").symbol_type is None
    assert extract_symbol_metadata("#include <iostream>\nusing namespace std;", "cpp").symbol_type is None


# --- php (reference test_php.py) ---------------------------------------------


def test_php_symbols():
    r = extract_symbol_metadata("<?php function process() { return true; }", "php")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("function", "process", "function process()")
    r = extract_symbol_metadata("<?php class User {}", "php")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("class", "User", "class User")
    r = extract_symbol_metadata("<?php interface Repository { public function save(); }", "php")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("interface", "Repository", "interface Repository")
    r = extract_symbol_metadata("<?php trait Timestamps { }", "php")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("interface", "Timestamps", "trait Timestamps")


def test_php_method_in_class():
    code = "<?php\nclass UserService {\n    public function findById($id) {\n        return null;\n    }\n}"
    r = extract_symbol_metadata(code, "php")
    assert (r.symbol_type, r.symbol_name) == ("class", "UserService")
    syms = extract_symbols(code, "php")
    assert syms[1]["symbol_type"] == "method"
    assert syms[1]["symbol_name"] == "UserService.findById"


# --- dockerfile (reference test_dockerfile.py) --------------------------------


def test_dockerfile_stage_and_args():
    r = extract_symbol_metadata("FROM golang:1.21 AS builder\nRUN go build -o app .\n", "dockerfile")
    assert (r.symbol_type, r.symbol_name) == ("class", "builder")
    assert "FROM" in r.symbol_signature
    assert extract_symbol_metadata("ARG VERSION=dev\n", "dockerfile").symbol_name == "VERSION"
    assert extract_symbol_metadata("ARG VERSION=dev\n", "dockerfile").symbol_type == "function"
    assert extract_symbol_metadata("ARG COMMIT_SHA\n", "dockerfile").symbol_name == "COMMIT_SHA"
    assert extract_symbol_metadata("FROM ubuntu:22.04\nRUN apt-get update\n", "dockerfile").symbol_type is None


# --- hcl (reference test_hcl.py) ----------------------------------------------


def test_hcl_blocks():
    r = extract_symbol_metadata('resource "aws_s3_bucket" "data" {\n  bucket = "my-bucket"\n}', "hcl")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == (
        "class", "aws_s3_bucket.data", 'resource "aws_s3_bucket" "data"',
    )
    r = extract_symbol_metadata('variable "region" {\n  default = "us-east-1"\n}', "hcl")
    assert (r.symbol_name, r.symbol_signature) == ("region", 'variable "region"')
    r = extract_symbol_metadata('data "aws_ami" "ubuntu" {\n  most_recent = true\n}', "tf")
    assert r.symbol_name == "aws_ami.ubuntu"
    r = extract_symbol_metadata('module "vpc" {\n  source = "./modules/vpc"\n}', "hcl")
    assert r.symbol_name == "vpc"
    r = extract_symbol_metadata('locals {\n  name = "test"\n}', "hcl")
    assert (r.symbol_type, r.symbol_name) == ("class", "locals")


# --- scala (reference test_scala.py) --------------------------------------------


def test_scala_types():
    r = extract_symbol_metadata("class MyClass {\n  val x = 1\n}", "scala")
    assert (r.symbol_type, r.symbol_name) == ("class", "MyClass")
    assert "class MyClass" in r.symbol_signature
    assert extract_symbol_metadata("case class Dog(name: String, age: Int)", "scala").symbol_name == "Dog"
    assert extract_symbol_metadata("abstract class Animal {\n  def speak(): String\n}", "scala").symbol_name == "Animal"
    r = extract_symbol_metadata("trait Serializable {\n  def serialize(): String\n}", "scala")
    assert (r.symbol_type, r.symbol_name) == ("interface", "Serializable")
    assert extract_symbol_metadata("sealed trait Color", "scala").symbol_type == "interface"
    r = extract_symbol_metadata("object Utils {\n  def helper(): Unit = {}\n}", "scala")
    assert (r.symbol_type, r.symbol_name) == ("class", "Utils")
    assert extract_symbol_metadata("case object Red", "scala").symbol_name == "Red"


def test_scala_methods_qualified():
    for code, want in (
        ("class Calculator {\n  def add(x: Int, y: Int): Int = x + y\n}", "Calculator.add"),
        ("trait Handler {\n  def handle(input: String): Unit\n}", "Handler.handle"),
        ("object Utils {\n  def helper(): Unit = {}\n}", "Utils.helper"),
    ):
        syms = [s for s in extract_symbols(code, "scala") if s["symbol_type"] == "method"]
        assert syms and syms[0]["symbol_name"] == want


def test_scala_toplevel_fn_and_alias():
    r = extract_symbol_metadata("def process(x: Int): String = x.toString", "scala")
    assert (r.symbol_type, r.symbol_name) == ("function", "process")
    r = extract_symbol_metadata("type Callback = Int => Unit", "scala")
    assert (r.symbol_type, r.symbol_name) == ("interface", "Callback")


def test_method_attribution_stops_at_class_body_end():
    """A function in a LATER brace block at the same depth as a closed
    class body must not be attributed as a method of that class
    (round-4 self-review finding, confirmed by execution pre-fix)."""
    syms = extract_symbols(
        "class A { m() {} }\nconst obj = { foo() { return 1; } };", "js"
    )
    names = {s["symbol_name"] for s in syms}
    assert "A.m" in names and "A.foo" not in names
    syms = extract_symbols(
        "<?php class A { public function m() {} }\nif (true) { function g() {} }",
        "php",
    )
    names = {s["symbol_name"]: s["symbol_type"] for s in syms}
    assert names.get("A.m") == "method" and "A.g" not in names
    assert names.get("g") == "function"
    syms = extract_symbols(
        "class A {\n  def m(): Unit = {}\n}\nobject B {\n  def helper(): Unit = {}\n}",
        "scala",
    )
    names = {s["symbol_name"] for s in syms}
    assert "A.m" in names and "B.helper" in names and "A.helper" not in names
    syms = extract_symbols(
        "class A { void m() {} }\nclass B { void n() {} }", "java"
    )
    names = {s["symbol_name"] for s in syms}
    assert "A.m" in names and "B.n" in names and "A.n" not in names


# --- typescript extras (reference test_typescript.py) --------------------------


def test_ts_interface_and_alias():
    r = extract_symbol_metadata("interface User {\n  id: number;\n}", "ts")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("interface", "User", "interface User")
    assert extract_symbol_metadata("interface Admin extends User {\n  role: string;\n}", "ts").symbol_name == "Admin"
    r = extract_symbol_metadata("type UserID = string;", "ts")
    assert (r.symbol_type, r.symbol_name, r.symbol_signature) == ("interface", "UserID", "type UserID = string;")
    assert extract_symbol_metadata("type Status = 'on' | 'off';", "ts").symbol_name == "Status"
    r = extract_symbol_metadata("type UserConfig = {\n  name: string;\n};", "ts")
    assert (r.symbol_name, r.symbol_signature) == ("UserConfig", "type UserConfig =")
    assert extract_symbol_metadata("interface Props { title: string; }", "tsx").symbol_name == "Props"
    # js surface still intact through the ts scanner
    assert extract_symbol_metadata("function fetchUser(id: number): User { return x; }", "ts").symbol_name == "fetchUser"
    assert extract_symbol_metadata("const fetchData = async (url: string) => { return 1; }", "ts").symbol_name == "fetchData"


# --- css (reference test_css.py) --------------------------------------------


def test_css_selectors():
    r = extract_symbol_metadata(".header {\n    color: red;\n}", "css")
    assert (r.symbol_type, r.symbol_name) == ("class", "header")
    assert ".header" in r.symbol_signature
    r = extract_symbol_metadata("#main {\n    display: flex;\n}", "css")
    assert (r.symbol_type, r.symbol_name) == ("class", "main")
    assert "#main" in r.symbol_signature
    r = extract_symbol_metadata("body {\n    margin: 0;\n}", "css")
    assert (r.symbol_type, r.symbol_name) == ("class", "body")
    assert extract_symbol_metadata(".container {\n    padding: 10px;\n}", "scss").symbol_name == "container"
    assert extract_symbol_metadata("color: red;\nfont-size: 14px;", "css").symbol_type is None


def test_css_keyframes_and_media():
    code = "@keyframes fadeIn {\n  from { opacity: 0; }\n  to { opacity: 1; }\n}"
    r = extract_symbol_metadata(code, "css")
    assert (r.symbol_type, r.symbol_name) == ("function", "fadeIn")
    assert "@keyframes fadeIn" in r.symbol_signature
    r = extract_symbol_metadata("@media (max-width: 768px) {\n    .mobile { display: block; }\n}", "css")
    assert r.symbol_type == "class" and "max-width" in r.symbol_name
    assert "@media" in r.symbol_signature


def test_scanners_never_raise_on_adversarial_text():
    """The scanners run inside map_batches over arbitrary transcript
    text: drive the INTERNAL per-language functions (extract_symbols
    swallows exceptions by design, which would hide a systematic crash)
    over adversarial shapes — unbalanced braces/parens, lone quotes,
    null-ish bytes, comment openers at EOF."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from coco_search_ray.stages.symbols import _SCANNERS

    adversarial = [
        "", "{", "}", "{{{", "}}}", "(", ")", "'", '"', "`", "/*", "//",
        "#", "\\", "def ", "class ", "fn main() {", "impl {", "@",
        "class A {", "def f(:", "type =", "impl for {", "func (",
        "resource \"a\" {", "{{ include \"", "interface {",
        "\x00def f():", "a{b}c{d}e", "'unterminated", '"unterminated',
        "def f(\n\n\n", "template<", "namespace {", "FROM x AS ",
    ]
    for text in adversarial:
        for lang, scan in _SCANNERS.items():
            for sym in scan(text):
                assert sym["symbol_name"]

    @settings(max_examples=150, deadline=None)
    @given(st.text(alphabet=st.characters(codec="ascii"), max_size=120))
    def fuzz(text):
        for scan in _SCANNERS.values():
            for sym in scan(text):
                assert sym["symbol_name"] is not None

    fuzz()


def test_second_review_regressions():
    """Round-4 second-review findings, pinned (all confirmed by
    execution pre-fix)."""
    # cpp: qualified CALLS are not methods; scoped enums name correctly
    assert extract_symbols("if (std::isnan(x)) { return 1; }", "cpp") == []
    assert extract_symbols("auto t = std::thread([]{ run(); });", "cpp") == []
    r = extract_symbol_metadata("enum class Color { Red, Green };", "cpp")
    assert (r.symbol_type, r.symbol_name) == ("class", "Color")
    assert extract_symbol_metadata("void MyClass::myMethod() { }", "cpp").symbol_name == "myMethod"
    # css: block comments are masked
    syms = extract_symbols("/* .legacy { color: red } */\n.new { }", "css")
    assert [s["symbol_name"] for s in syms] == ["new"]
    # php: '#' line comments are masked
    syms = extract_symbols("<?php\n# function hidden() {}\nclass Real {}", "php")
    assert [s["symbol_name"] for s in syms] == ["Real"]
    # scala: multiline extends clause keeps the body (methods qualified)
    syms = extract_symbols(
        "class Foo(x: Int)\n  extends Bar {\n  def m(): Unit = {}\n}", "scala"
    )
    assert {s["symbol_name"] for s in syms} >= {"Foo", "Foo.m"}
    # hcl: nested blocks are attributes, not symbols
    syms = extract_symbols(
        'resource "aws_sg" "x" {\n  ingress {\n    from_port = 80\n  }\n}', "hcl"
    )
    assert [s["symbol_name"] for s in syms] == ["aws_sg.x"]


def test_prose_apostrophe_does_not_mask_following_code():
    """Round-5 advisory (medium): an unpaired apostrophe — prose
    contraction before code, or a Rust lifetime — must not open a
    phantom string that masks the rest of the turn. Unterminated
    '-strings are bounded at the newline; rust/scala/go/java/c/cpp
    treat ' as a char/rune literal only."""
    # prose contraction before js code (the advisory's verified repro)
    syms = extract_symbols("Here's my function:\nfunction foo() { return 1; }", "js")
    assert [s["symbol_name"] for s in syms] == ["foo"]
    # rust: odd lifetime-apostrophe count must not lose later symbols
    rust = (
        "fn first() -> &'static str { \"a\" }\n"
        "struct Point { x: i32 }\n"
        "impl Point { fn norm<'a>(&'a self) -> f64 { 0.0 } }"
    )
    names = [s["symbol_name"] for s in extract_symbols(rust, "rust")]
    assert names == ["first", "Point", "Point.norm"]
    # rust char literals still masked: a brace inside one is not code
    syms = extract_symbols("fn f() -> char { '{' }\nfn g() {}", "rust")
    assert [s["symbol_name"] for s in syms] == ["f", "g"]
    # scala: prose + generic lifetime-free code unaffected
    syms = extract_symbols(
        "It's simple:\ndef add(a: Int, b: Int): Int = a + b\nclass Box[T](val v: T)",
        "scala",
    )
    assert [s["symbol_name"] for s in syms] == ["add", "Box"]
    # js: a REAL single-quoted string on one line still masks its content
    syms = extract_symbols("const s = 'function hidden() {'\nfunction real() {}", "js")
    assert [s["symbol_name"] for s in syms] == ["real"]
    # go: rune literal with a brace
    syms = extract_symbols("func f() rune { return '{' }\nfunc g() {}", "go")
    assert [s["symbol_name"] for s in syms] == ["f", "g"]


def test_python_mask_strings_and_comments():
    """Round-5 advisory (low): def/class inside string literals or
    comments must not emit symbols (the tree-sitter reference only
    captures real definition nodes)."""
    py = 'EXAMPLE = """\ndef fake(): pass\nclass FakeC: pass\n"""\ndef real():\n    return 1\n'
    assert [s["symbol_name"] for s in extract_symbols(py, "python")] == ["real"]
    py2 = "# def commented(): pass\ns = 'def in_str(): pass'\ndef real2(): pass"
    assert [s["symbol_name"] for s in extract_symbols(py2, "python")] == ["real2"]
    # prose apostrophe before python code: later defs survive
    py3 = "Here's the fix:\ndef patched(x):\n    return x\n"
    assert [s["symbol_name"] for s in extract_symbols(py3, "python")] == ["patched"]
    # unterminated triple-quote masks to end (tree-sitter error recovery)
    py4 = 'def a(): pass\nS = """\ndef ghost(): pass\n'
    assert [s["symbol_name"] for s in extract_symbols(py4, "python")] == ["a"]
    # f-string containing def-like text
    py5 = "msg = f'def {name}(): ...'\ndef real3(): pass"
    assert [s["symbol_name"] for s in extract_symbols(py5, "python")] == ["real3"]


def test_fuzz_newest_languages_adversarial_nesting():
    """Fuzz round 2 (round-4 verdict #8): the seven newest scanners —
    scala/css/php/dockerfile/hcl/ts/cpp — against adversarial nesting:
    unterminated strings, heredoc-ish openers, CRLF line ends, prose
    apostrophes, deep unbalanced braces. Scanners must never raise and
    every emitted symbol must carry a name."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from coco_search_ray.stages.symbols import _SCANNERS

    newest = ["scala", "css", "php", "dockerfile", "hcl", "typescript", "cpp"]
    adversarial = [
        "def f = '",
        "It's a test\r\nclass A {\r\n  def m() = 1\r\n}",
        "<<EOF\nclass X {}\nEOF",
        "<<<HTML\nfunction f() {}\nHTML;",
        "@media ( { .a { } ",
        "resource \"x\" \"y\" { a = \"${var.'}\" }",
        "FROM a AS 'b\nRUN echo don't",
        "template <typename T> struct S { T t['x']; };",
        "type T = { a: 'b' } | \"unterminated",
        "{" * 200 + "'" + "}" * 199,
        "/* " + "'" * 50,
        "class A { def b = c'd'e'f'g }",
        "interface I { m(): void } // it's fine",
    ]
    for text in adversarial:
        for lang in newest:
            for sym in _SCANNERS[lang](text):
                assert sym["symbol_name"]

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(
            alphabet=st.sampled_from(list("'\"`{}()<>#/\\\r\n defclasfunctiompriv")),
            max_size=150,
        )
    )
    def fuzz(text):
        for lang in newest:
            for sym in _SCANNERS[lang](text):
                assert sym["symbol_name"] is not None

    fuzz()


def test_bash_php_multiline_single_quoted_strings_stay_masked():
    """Round-5 review finding: bash/php single-quoted strings DO span
    lines — the canonical VAR='...' assignment shape must mask its
    content across newlines (no phantom symbols from string bodies),
    while the prose-apostrophe rewind still protects mixed turns."""
    bash = "MSG='usage:\nfunction phantom() { hi }\n'\nfunction real() { :; }"
    assert [s["symbol_name"] for s in extract_symbols(bash, "bash")] == ["real"]
    php = "<?php\n$m='one\nfunction phantom() {}\ntwo';\nfunction real() {}"
    assert [s["symbol_name"] for s in extract_symbols(php, "php")] == ["real"]
    # prose apostrophes (never =-preceded) still don't mask later code
    assert [s["symbol_name"] for s in extract_symbols(
        "echo it's fine\nfunction real() { :; }", "bash")] == ["real"]
    # single-line '-strings behave exactly as before
    assert [s["symbol_name"] for s in extract_symbols(
        "X='function nope() {}'\nfunction real() { :; }", "bash")] == ["real"]
